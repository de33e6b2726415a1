"""Flax ResNet family (NHWC, TPU-native) — the classification tail behind
every splittable model in the benchmark.

Functional re-design of the torchvision ResNets the reference builds on
(`/root/reference/sc2bench/models/backbone.py:658-698` pulls
`torchvision.models.resnet50/101/152`). Torchvision v1.5 semantics: stride
lives on the 3x3 conv of each bottleneck block. Intermediate activations are
exposed with `sow('intermediates', ...)` — the functional replacement for
torchdistill forward hooks (SURVEY.md §7 design stance). BatchNorm train/eval
is selected per-call via `use_running_average`, so one parameter set serves
both separately-jitted train and eval programs.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with affine params and running stats all frozen — the
    reference's torchvision `FrozenBatchNorm2d` option for detection
    backbones (`/root/reference/sc2bench/models/backbone.py:690-698`).
    Parameter/stat names match `nn.BatchNorm` (scale/bias + batch_stats
    mean/var) so checkpoints convert transparently; gradients are stopped
    and stats never update regardless of train mode."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        import jax
        c = x.shape[-1]
        scale = self.param('scale', self.scale_init, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((c,), jnp.float32))
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        inv = jax.lax.rsqrt(var.value + self.epsilon) * scale
        y = (x - mean.value) * inv + bias
        return y.astype(self.dtype)


def _bn(name: str, dtype=jnp.float32, frozen: bool = False):
    # dtype = output/compute dtype; statistics accumulate in float32
    # regardless, so bfloat16 keeps the conv->BN->relu chain cast-free.
    if frozen:
        return FrozenBatchNorm(dtype=dtype, name=name)
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class BottleneckBlock(nn.Module):
    """ResNet v1.5 bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + shortcut.
    `dilation` implements the dilated (stride-replaced) variant used by
    DeepLabv3 backbones (torchvision `replace_stride_with_dilation`)."""

    filters: int
    strides: int = 1
    dilation: int = 1
    expansion: int = 4
    zero_init_residual: bool = True
    dtype: Dtype = jnp.float32  # compute dtype; bfloat16 feeds the MXU
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = _bn('bn1', self.dtype, self.frozen_bn)(y, use_running_average=ura)
        y = nn.relu(y)
        d = self.dilation
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=((d, d), (d, d)), kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype, name='conv2')(y)
        y = _bn('bn2', self.dtype, self.frozen_bn)(y, use_running_average=ura)
        y = nn.relu(y)
        y = nn.Conv(self.filters * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y)
        scale_init = nn.initializers.zeros if self.zero_init_residual \
            else nn.initializers.ones
        if self.frozen_bn:
            bn3 = FrozenBatchNorm(dtype=self.dtype, name='bn3',
                                  scale_init=scale_init)
        else:
            bn3 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                               name='bn3', scale_init=scale_init)
        y = bn3(y, use_running_average=ura)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            residual = _bn('downsample_bn', self.dtype, self.frozen_bn)(
                residual, use_running_average=ura)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    """One layerN stage: `blocks` bottleneck blocks, stride on the first.
    With `dilate=True` the stride is replaced by dilation (DeepLab)."""

    filters: int
    blocks: int
    strides: int = 1
    dilation: int = 1
    dilate: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = 1 if self.dilate else self.strides
        first_dil = self.dilation
        block_dil = self.dilation * (self.strides if self.dilate else 1)
        block_cls = nn.remat(BottleneckBlock) if self.remat \
            else BottleneckBlock
        for i in range(self.blocks):
            x = block_cls(
                self.filters, strides=strides if i == 0 else 1,
                dilation=first_dil if i == 0 else block_dil,
                dtype=self.dtype, frozen_bn=self.frozen_bn,
                name=f'block{i}')(x, train)
        return x


class ResNetStem(nn.Module):
    """conv7x7 s2 + BN + ReLU + maxpool3x3 s2 (ImageNet stem)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = _bn('bn1', self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class ResNet(nn.Module):
    """Full classifier. `stage_sizes`: [3,4,6,3]=R50, [3,4,23,3]=R101,
    [3,8,36,3]=R152. `forward_until`/`forward_from` split the network at a
    named layer — the head/tail boundary used by the feature-compression and
    fine-tuning families (reference `wrapper.py:138-264` via torchdistill
    `redesign_model`)."""

    stage_sizes: Sequence[int]
    num_classes: int = 1000
    sow_intermediates: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.dtype
        self.stem = ResNetStem(dtype=d)
        self.layer1 = ResNetStage(64, self.stage_sizes[0], strides=1, dtype=d)
        self.layer2 = ResNetStage(128, self.stage_sizes[1], strides=2, dtype=d)
        self.layer3 = ResNetStage(256, self.stage_sizes[2], strides=2, dtype=d)
        self.layer4 = ResNetStage(512, self.stage_sizes[3], strides=2, dtype=d)
        self.fc = nn.Dense(self.num_classes)

    def _stages(self):
        return [('layer1', self.layer1), ('layer2', self.layer2),
                ('layer3', self.layer3), ('layer4', self.layer4)]

    def __call__(self, x, train: bool = False):
        x = self.stem(x, train)
        for name, stage in self._stages():
            x = stage(x, train)
            if self.sow_intermediates:
                self.sow('intermediates', f'{name}_out', x)
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x)

    def forward_until(self, x, split_layer: str = 'layer2',
                      train: bool = False, include_stem: bool = True):
        """Head program: stem..split_layer inclusive ('stem' = stem only)."""
        if include_stem:
            x = self.stem(x, train)
        if split_layer == 'stem':
            return x
        for name, stage in self._stages():
            x = stage(x, train)
            if name == split_layer:
                return x
        raise ValueError(f'unknown split layer {split_layer}')

    def forward_from(self, feature, split_layer: str = 'layer2',
                     train: bool = False):
        """Tail program: layers after split_layer + avgpool + fc.
        split_layer='avgpool' means only fc remains (feature is pooled)."""
        x = feature
        if split_layer != 'avgpool':
            passed = split_layer == 'stem'
            for name, stage in self._stages():
                if passed:
                    x = stage(x, train)
                elif name == split_layer:
                    passed = True
            x = jnp.mean(x, axis=(1, 2))
        return self.fc(x)


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
