"""Flax RegNet (Y-variant with SE) for the splittable RegNet family.

Native implementation of the timm `regnety_064` the reference wraps
(`/root/reference/sc2bench/models/backbone.py:487-563,823-854`:
`SplittableRegNet` keeps timm stages s2-s4 + head after the bottleneck).
Widths/depths come from the RegNet design-space generator (Radosavovic et
al.), parameterized by (w0, wa, wm, depth, group_width).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..registry import register_model
from .layer import get_layer


def generate_regnet_params(w0, wa, wm, depth, group_width, q=8):
    """Quantized per-stage widths/depths (RegNet paper eq. 1-4)."""
    ks = np.round(
        np.log((w0 + wa * np.arange(depth)) / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = np.round(widths / q) * q
    widths = np.minimum(widths, np.round(widths / group_width)
                        * group_width + group_width * (widths % group_width > 0) * 0)
    # group-width adjust: width must be divisible by its group width
    widths = [int(max(group_width, round(w / group_width) * group_width))
              for w in widths]
    stage_widths, stage_depths = [], []
    for w in widths:
        if stage_widths and stage_widths[-1] == w:
            stage_depths[-1] += 1
        else:
            stage_widths.append(w)
            stage_depths.append(1)
    return stage_widths, stage_depths


class SEBlock(nn.Module):
    se_ratio: float = 0.25
    in_ch: int = 0

    @nn.compact
    def __call__(self, x):
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(se_ch, (1, 1), name='fc1')(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), name='fc2')(s))
        return x * s


class RegNetBottleneck(nn.Module):
    width: int
    strides: int = 1
    group_width: int = 8
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        groups = max(1, self.width // self.group_width)
        y = nn.Conv(self.width, (1, 1), use_bias=False, name='conv1')(x)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='bn1')(y, use_running_average=ura)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), (self.strides, self.strides),
                    ((1, 1), (1, 1)), feature_group_count=groups,
                    use_bias=False, name='conv2')(y)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='bn2')(y, use_running_average=ura)
        y = nn.relu(y)
        if self.se_ratio:
            y = SEBlock(self.se_ratio, in_ch=x.shape[-1], name='se')(y)
        y = nn.Conv(self.width, (1, 1), use_bias=False, name='conv3')(y)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='bn3')(y, use_running_average=ura)
        if x.shape != y.shape:
            x = nn.Conv(self.width, (1, 1), (self.strides, self.strides),
                        use_bias=False, name='down_conv')(x)
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='down_bn')(x, use_running_average=ura)
        return nn.relu(x + y)


class RegNetStage(nn.Module):
    width: int
    depth: int
    group_width: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = RegNetBottleneck(self.width, 2 if i == 0 else 1,
                                 self.group_width, self.se_ratio,
                                 name=f'block{i}')(x, train)
        return x


class SplittableRegNet(nn.Module):
    """Bottleneck (replacing stem+s1) + RegNet s2-s4 + head
    (reference `backbone.py:487-563`). `forward_tail` is the deploy-path
    server side (bottleneck output -> logits) the split runtime jits."""

    bottleneck_layer: nn.Module
    stage_widths: tuple = (288, 576, 1296)   # s2..s4 (regnety_064)
    stage_depths: tuple = (7, 14, 2)
    group_width: int = 72
    num_classes: int = 1000
    sow_intermediates: bool = True

    def setup(self):
        self.s2 = RegNetStage(self.stage_widths[0], self.stage_depths[0],
                              self.group_width)
        self.s3 = RegNetStage(self.stage_widths[1], self.stage_depths[1],
                              self.group_width)
        self.s4 = RegNetStage(self.stage_widths[2], self.stage_depths[2],
                              self.group_width)
        self.head_fc = nn.Dense(self.num_classes)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        return self.forward_tail(z, train=train, sow=self.sow_intermediates)

    def forward_tail(self, feature, train: bool = False, sow: bool = False):
        z = feature
        for i, stage in ((2, self.s2), (3, self.s3), (4, self.s4)):
            z = stage(z, train)
            if sow:
                self.sow('intermediates', f's{i}_out', z)
        z = jnp.mean(z, axis=(1, 2))
        return self.head_fc(z)


class RegNet(nn.Module):
    """Full (unsplit) RegNetY classifier — the teacher anchor the reference
    takes from timm (`regnety_064`, `backbone.py:823-854`). Sows s1..s4
    outputs so distillation hint losses can target them."""

    stage_widths: tuple = (144, 288, 576, 1296)   # s1..s4 (regnety_064)
    stage_depths: tuple = (2, 7, 14, 2)
    group_width: int = 72
    num_classes: int = 1000
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        z = nn.Conv(32, (3, 3), (2, 2), ((1, 1), (1, 1)), use_bias=False,
                    name='stem_conv')(x)
        z = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='stem_bn')(
            z, use_running_average=not train)
        z = nn.relu(z)
        for i, (w, d) in enumerate(zip(self.stage_widths,
                                       self.stage_depths), start=1):
            z = RegNetStage(w, d, self.group_width, name=f's{i}')(z, train)
            if self.sow_intermediates:
                self.sow('intermediates', f's{i}_out', z)
        z = jnp.mean(z, axis=(1, 2))
        return nn.Dense(self.num_classes, name='head_fc')(z)


@register_model
def regnety_064(num_classes=1000, **kwargs):
    """Teacher builder matching the reference's timm `regnety_064`
    (RegNetY-6.4GF) anchor."""
    return RegNet(num_classes=num_classes)


@register_model
def splittable_regnet(bottleneck_config, regnet_name='regnety_064',
                      num_classes=1000, **kwargs):
    """Builder (reference `backbone.py:823-854`)."""
    presets = {
        # (stage_widths s2.., stage_depths s2.., group_width)
        'regnety_064': ((288, 576, 1296), (7, 14, 2), 72),
        'regnety_016': ((120, 336, 888), (6, 17, 2), 24),
    }
    widths, depths, gw = presets[regnet_name]
    bottleneck = get_layer(bottleneck_config['key'],
                           **bottleneck_config.get('kwargs', {}))
    return SplittableRegNet(bottleneck_layer=bottleneck,
                            stage_widths=widths, stage_depths=depths,
                            group_width=gw, num_classes=num_classes)
