"""Flax EfficientNet (MBConv + SE) for the input-compression classifiers.

Native implementation of the timm `tf_efficientnet_l2_ns` / `..._475`
backbones the reference uses as input-compression anchors
(`/root/reference/configs/ilsvrc2012/input_compression/
jpeg-tf_efficientnet_l2_ns_475.yaml:1`, resolved via timm in
`sc2bench/models/registry.py:108-139`). Standard compound scaling (Tan &
Le): per-stage channels scale by `width_coefficient` (rounded to multiples
of 8), per-stage depths by `depth_coefficient` (ceil); L2 uses width 4.3,
depth 5.3.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..registry import register_model

# (expand_ratio, channels, num_layers, stride, kernel) — EfficientNet-B0
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def round_channels(c, width_coefficient, divisor=8):
    c *= width_coefficient
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def round_repeats(r, depth_coefficient):
    return int(math.ceil(depth_coefficient * r))


class MBConv(nn.Module):
    out_ch: int
    expand_ratio: int
    stride: int = 1
    kernel: int = 3
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, name='expand_conv')(y)
            y = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name='expand_bn')(
                y, use_running_average=ura)
            y = nn.silu(y)
        k, s = self.kernel, self.stride
        # 'SAME' == TF-style asymmetric padding — the timm `tf_` variants
        # pad bottom/right-heavy on stride 2, and real tf_efficientnet_l2
        # weights reproduce only under the same convention
        y = nn.Conv(mid, (k, k), (s, s), 'SAME',
                    feature_group_count=mid, use_bias=False,
                    name='dw_conv')(y)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name='dw_bn')(
            y, use_running_average=ura)
        y = nn.silu(y)
        if self.se_ratio:
            se_ch = max(1, int(in_ch * self.se_ratio))
            s_ = jnp.mean(y, axis=(1, 2), keepdims=True)
            s_ = nn.silu(nn.Conv(se_ch, (1, 1), name='se_reduce')(s_))
            s_ = nn.sigmoid(nn.Conv(mid, (1, 1), name='se_expand')(s_))
            y = y * s_
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name='project_conv')(y)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name='project_bn')(
            y, use_running_average=ura)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """Compound-scaled EfficientNet classifier (NHWC)."""

    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    num_classes: int = 1000
    stem_channels: int = 32
    head_channels: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        ura = not train
        stem = round_channels(self.stem_channels, self.width_coefficient)
        z = nn.Conv(stem, (3, 3), (2, 2), 'SAME', use_bias=False,
                    name='stem_conv')(x)
        z = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name='stem_bn')(
            z, use_running_average=ura)
        z = nn.silu(z)
        for si, (expand, c, n, stride, k) in enumerate(_B0_STAGES):
            out_ch = round_channels(c, self.width_coefficient)
            repeats = round_repeats(n, self.depth_coefficient)
            for bi in range(repeats):
                z = MBConv(out_ch, expand, stride if bi == 0 else 1, k,
                           name=f'stage{si}_block{bi}')(z, train)
            self.sow('intermediates', f'stage{si}_out', z)
        head = round_channels(self.head_channels, self.width_coefficient)
        z = nn.Conv(head, (1, 1), use_bias=False, name='head_conv')(z)
        z = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name='head_bn')(
            z, use_running_average=ura)
        z = nn.silu(z)
        z = jnp.mean(z, axis=(1, 2))
        return nn.Dense(self.num_classes, name='classifier')(z)


@register_model
def efficientnet(width_coefficient=1.0, depth_coefficient=1.0,
                 num_classes=1000, **kwargs):
    return EfficientNet(width_coefficient=width_coefficient,
                        depth_coefficient=depth_coefficient,
                        num_classes=num_classes)


@register_model
def tf_efficientnet_l2_ns(num_classes=1000, **kwargs):
    """EfficientNet-L2 (width 4.3, depth 5.3) — the timm noisy-student
    anchor; evaluated at 800px by the reference sweep."""
    return EfficientNet(width_coefficient=4.3, depth_coefficient=5.3,
                        num_classes=num_classes)


@register_model
def tf_efficientnet_l2_ns_475(num_classes=1000, **kwargs):
    """EfficientNet-L2 at the 475px eval resolution (same architecture;
    resolution is a data-pipeline property)."""
    return EfficientNet(width_coefficient=4.3, depth_coefficient=5.3,
                        num_classes=num_classes)
