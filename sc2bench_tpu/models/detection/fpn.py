"""Feature Pyramid Network + anchor generation.

TPU-native equivalents of torchvision's FPN/AnchorGenerator used by the
reference's detection stack (`/root/reference/sc2bench/models/detection/
base.py:44-129` wraps `FeaturePyramidNetwork` + LastLevelMaxPool). All
shapes static for a fixed input size — anchors are computed once per
(H, W) and constant-folded by XLA.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FeaturePyramidNetwork(nn.Module):
    """Lateral 1x1 + top-down 2x upsample + 3x3 smoothing, P2..P5 (+P6 via
    max-pool when `extra_maxpool`)."""

    out_channels: int = 256
    extra_maxpool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'inner_{i}')(f)
            for i, f in enumerate(features)]
        # top-down pathway
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(laterals[i + 1], laterals[i].shape,
                                  'nearest')
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f'layer_{i}')(l)
            for i, l in enumerate(laterals)]
        if self.extra_maxpool:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


def generate_anchors(feature_shapes, image_hw,
                     sizes=((32,), (64,), (128,), (256,), (512,)),
                     aspect_ratios=(0.5, 1.0, 2.0)):
    """Per-level anchor boxes (concatenated (A_total, 4), numpy, static).
    torchvision AnchorGenerator semantics: zero-centered cell anchors shifted
    by stride grid."""
    ih, iw = image_hw
    all_anchors = []
    for (fh, fw), level_sizes in zip(feature_shapes, sizes):
        stride_h = ih // fh
        stride_w = iw // fw
        cell = []
        for ar in aspect_ratios:
            for size in level_sizes:
                # torchvision convention: aspect_ratio = h / w
                h = size * np.sqrt(ar)
                w = size / np.sqrt(ar)
                cell.append([-w / 2, -h / 2, w / 2, h / 2])
        cell = np.asarray(cell, np.float32).round()
        shifts_x = np.arange(fw, dtype=np.float32) * stride_w
        shifts_y = np.arange(fh, dtype=np.float32) * stride_h
        sx, sy = np.meshgrid(shifts_x, shifts_y)
        shifts = np.stack([sx.ravel(), sy.ravel(),
                           sx.ravel(), sy.ravel()], axis=1)
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        all_anchors.append(anchors)
    return [np.asarray(a, np.float32) for a in all_anchors]
