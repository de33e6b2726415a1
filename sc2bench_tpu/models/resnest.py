"""Flax ResNeSt (split-attention ResNet) — the `resnest50d` tail.

Native implementation of the timm `resnest50d` the reference builds its
ResNeSt splittable variant on (`/root/reference/sc2bench/models/backbone.py:
786-820`): radix-2 split-attention 3x3 convs (Zhang et al., "ResNeSt:
Split-Attention Networks"), deep 3-conv stem, average-pool downsampling in
both the shortcut (`avg_down`) and the residual branch (`avd`). NHWC
layout; the split-attention pooling/softmax is elementwise work XLA fuses
around the grouped convs.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import register_model
from .layer import get_layer

Dtype = Any


def _bn(name, dtype=jnp.float32):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class SplitAttentionConv(nn.Module):
    """3x3 grouped conv with radix splits + learned per-split attention
    (timm `SplAtConv2d`). Input (N,H,W,Cin) -> (N,H',W',channels)."""

    channels: int
    radix: int = 2
    groups: int = 1
    strides: int = 1
    reduction_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, c = self.radix, self.channels
        y = nn.Conv(c * r, (3, 3), (self.strides, self.strides),
                    ((1, 1), (1, 1)), feature_group_count=self.groups * r,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        y = _bn('bn0', self.dtype)(y, use_running_average=not train)
        y = nn.relu(y)
        n, h, w, _ = y.shape
        splits = y.reshape(n, h, w, r, c)
        # gap kept as a (N,1,1,C) map and fc1/fc2 as 1x1 convs — the timm
        # SplAtConv2d parameter shapes (Conv2d 1x1), so reference weights
        # convert with the uniform conv rule (utils/torch_convert.py)
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2), keepdims=True)
        inter = max(c * r // self.reduction_factor, 32)
        a = nn.Conv(inter, (1, 1), name='fc1')(gap)
        a = _bn('bn1', self.dtype)(a, use_running_average=not train)
        a = nn.relu(a)
        a = nn.Conv(c * r, (1, 1), name='fc2')(a).reshape(n, r, c)
        attn = nn.softmax(a, axis=1) if r > 1 else nn.sigmoid(a)
        return jnp.einsum('nhwrc,nrc->nhwc', splits, attn)


class ResNeStBlock(nn.Module):
    """ResNeSt bottleneck: 1x1 -> SplAt 3x3 -> 1x1(x4), with `avd` average
    pooling for stride-2 blocks and `avg_down` shortcut."""

    filters: int
    strides: int = 1
    radix: int = 2
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = _bn('bn1', self.dtype)(y, use_running_average=ura)
        y = nn.relu(y)
        y = SplitAttentionConv(self.filters, radix=self.radix, strides=1,
                               dtype=self.dtype, name='conv2')(y, train)
        if self.strides > 1:  # avd (avd_first=False): pool after SplAt
            y = nn.avg_pool(y, (3, 3), (self.strides, self.strides),
                            ((1, 1), (1, 1)))
        y = nn.Conv(self.filters * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y)
        y = _bn('bn3', self.dtype)(y, use_running_average=ura)
        if residual.shape != y.shape:
            if self.strides > 1:  # avg_down shortcut
                residual = nn.avg_pool(residual, (self.strides, self.strides),
                                       (self.strides, self.strides))
            residual = nn.Conv(self.filters * self.expansion, (1, 1),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(residual)
            residual = _bn('downsample_bn', self.dtype)(
                residual, use_running_average=ura)
        return nn.relu(y + residual)


class ResNeStStage(nn.Module):
    filters: int
    blocks: int
    strides: int = 1
    radix: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.blocks):
            x = ResNeStBlock(self.filters,
                             strides=self.strides if i == 0 else 1,
                             radix=self.radix, dtype=self.dtype,
                             name=f'block{i}')(x, train)
        return x


class ResNeSt(nn.Module):
    """Full resnest50d classifier (deep 3-conv stem + 4 split-attention
    stages); sows layerN_out for distillation hints."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    radix: int = 2
    sow_intermediates: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        ura = not train
        for i, ch in enumerate((32, 32, 64)):  # deep stem
            x = nn.Conv(ch, (3, 3), (2, 2) if i == 0 else (1, 1),
                        ((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                        name=f'stem_conv{i}')(x)
            x = _bn(f'stem_bn{i}', self.dtype)(x, use_running_average=ura)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))
        for i, (f, b) in enumerate(zip((64, 128, 256, 512),
                                       self.stage_sizes), start=1):
            x = ResNeStStage(f, b, strides=1 if i == 1 else 2,
                             radix=self.radix, dtype=self.dtype,
                             name=f'layer{i}')(x, train)
            if self.sow_intermediates:
                self.sow('intermediates', f'layer{i}_out', x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name='fc')(x)


class SplittableResNeSt(nn.Module):
    """Bottleneck (replacing stem+layer1) + ResNeSt layer2-4 + head — the
    real split-attention tail (reference `backbone.py:786-820`; previously
    aliased to a plain ResNet tail)."""

    bottleneck_layer: nn.Module
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    radix: int = 2
    skips_avgpool: bool = False
    skips_fc: bool = False
    sow_intermediates: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.dtype
        self.layer2 = ResNeStStage(128, self.stage_sizes[1], strides=2,
                                   radix=self.radix, dtype=d)
        self.layer3 = ResNeStStage(256, self.stage_sizes[2], strides=2,
                                   radix=self.radix, dtype=d)
        self.layer4 = ResNeStStage(512, self.stage_sizes[3], strides=2,
                                   radix=self.radix, dtype=d)
        if not (self.skips_avgpool and self.skips_fc):
            self.fc = nn.Dense(self.num_classes)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        return self.forward_tail(z, train=train, sow=self.sow_intermediates)

    def forward_tail(self, feature, train: bool = False, sow: bool = False):
        z = feature
        for i, stage in ((2, self.layer2), (3, self.layer3),
                         (4, self.layer4)):
            z = stage(z, train)
            if sow:
                self.sow('intermediates', f'layer{i}_out', z)
        if self.skips_avgpool:
            return z
        z = jnp.mean(z, axis=(1, 2))
        if self.skips_fc:
            return z
        return self.fc(z)


@register_model
def resnest50d(num_classes=1000, **kwargs):
    """Teacher builder matching the reference's timm `resnest50d` anchor."""
    return ResNeSt(num_classes=num_classes)
