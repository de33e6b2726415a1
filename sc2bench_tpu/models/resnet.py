"""Flax ResNet family (NHWC, TPU-native) — the classification tail behind
every splittable model in the benchmark.

Functional re-design of the torchvision ResNets the reference builds on
(`/root/reference/sc2bench/models/backbone.py:658-698` pulls
`torchvision.models.resnet50/101/152`). Torchvision v1.5 semantics: stride
lives on the 3x3 conv of each bottleneck block. Intermediate activations are
exposed with `sow('intermediates', ...)` — the functional replacement for
torchdistill forward hooks (SURVEY.md §7 design stance).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BottleneckBlock(nn.Module):
    """ResNet v1.5 bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + shortcut."""

    filters: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name='conv1')(x)
        y = self.norm(name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name='conv2')(y)
        y = self.norm(name='bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * self.expansion, (1, 1), use_bias=False,
                    name='conv3')(y)
        y = self.norm(name='bn3', scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name='downsample_conv')(x)
            residual = self.norm(name='downsample_bn')(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    """One layerN stage: `blocks` bottleneck blocks, stride on the first."""

    filters: int
    blocks: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = BottleneckBlock(
                self.filters, strides=self.strides if i == 0 else 1,
                norm=self.norm, name=f'block{i}')(x)
        return x


class ResNetStem(nn.Module):
    """conv7x7 s2 + BN + ReLU + maxpool3x3 s2 (ImageNet stem)."""

    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name='conv1')(x)
        x = self.norm(name='bn1')(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class ResNet(nn.Module):
    """Full classifier. `stage_sizes`: [3,4,6,3]=R50, [3,4,23,3]=R101,
    [3,8,36,3]=R152."""

    stage_sizes: Sequence[int]
    num_classes: int = 1000
    norm_momentum: float = 0.9
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.norm_momentum, epsilon=1e-5)
        x = ResNetStem(norm=norm, name='stem')(x)
        for i, blocks in enumerate(self.stage_sizes):
            x = ResNetStage(64 * 2 ** i, blocks,
                            strides=1 if i == 0 else 2, norm=norm,
                            name=f'layer{i + 1}')(x)
            if self.sow_intermediates:
                self.sow('intermediates', f'layer{i + 1}', x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, name='fc')(x)
        return x


def resnet50(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), **kwargs)


def resnet101(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), **kwargs)


def resnet152(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), **kwargs)


RESNET_BUILDERS: dict[str, Callable[..., ResNet]] = {
    'resnet50': resnet50,
    'resnet101': resnet101,
    'resnet152': resnet152,
}
