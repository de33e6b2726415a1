"""RoIAlign as dense bilinear gathers (static shapes, vmap over RoIs).

TPU-native replacement for torchvision's CUDA RoIAlign used by the
reference's Faster R-CNN (`sc2bench/models/detection/rcnn.py` via
MultiScaleRoIAlign). torchvision semantics with aligned=False,
sampling_ratio fixed: each output cell averages sampling_ratio² bilinear
samples. Multi-scale assignment follows the FPN paper's
k = floor(4 + log2(sqrt(area)/224)) rule; all levels are computed densely
and blended by a one-hot level mask (keeps shapes static and the gather
pattern XLA-friendly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(feature, ys, xs):
    """feature (H, W, C); ys/xs arbitrary equal shapes -> (..., C)."""
    h, w, _ = feature.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1, x1 = y0 + 1, x0 + 1
    wy1 = ys - y0
    wx1 = xs - x0
    wy0, wx0 = 1 - wy1, 1 - wx1

    def gather(yy, xx):
        yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return feature[yi, xi]

    # torchvision zeroes samples outside the feature map (after the -1 shift
    # tolerance); emulate with validity weights.
    valid = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    out = (gather(y0, x0) * (wy0 * wx0)[..., None]
           + gather(y0, x1) * (wy0 * wx1)[..., None]
           + gather(y1, x0) * (wy1 * wx0)[..., None]
           + gather(y1, x1) * (wy1 * wx1)[..., None])
    return out * valid[..., None]


def roi_align(feature, boxes, output_size: int, spatial_scale: float,
              sampling_ratio: int = 2):
    """feature (H, W, C), boxes (R, 4) in image coords -> (R, out, out, C)."""

    def one_roi(box):
        x1, y1, x2, y2 = box * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_h = roi_h / output_size
        bin_w = roi_w / output_size
        s = sampling_ratio
        # sample grid: (out, s) offsets per axis
        iy = jnp.arange(output_size)[:, None] * bin_h + \
            (jnp.arange(s)[None, :] + 0.5) * bin_h / s + y1
        ix = jnp.arange(output_size)[:, None] * bin_w + \
            (jnp.arange(s)[None, :] + 0.5) * bin_w / s + x1
        ys = jnp.broadcast_to(iy[:, None, :, None],
                              (output_size, output_size, s, s))
        xs = jnp.broadcast_to(ix[None, :, None, :],
                              (output_size, output_size, s, s))
        samples = _bilinear_sample(feature, ys - 0.5, xs - 0.5)
        return jnp.mean(samples, axis=(2, 3))

    return jax.vmap(one_roi)(boxes)


def multiscale_roi_align(features: list, boxes, output_size: int,
                         scales: list, sampling_ratio: int = 2,
                         canonical_scale: int = 224,
                         canonical_level: int = 4):
    """features: list of (H_l, W_l, C) maps (P2..P5); boxes (R, 4).
    Returns (R, out, out, C)."""
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-6))
    k = jnp.clip(k, 2, 2 + len(features) - 1).astype(jnp.int32) - 2
    outs = jnp.stack([
        roi_align(f, boxes, output_size, sc, sampling_ratio)
        for f, sc in zip(features, scales)])  # (L, R, out, out, C)
    onehot = jax.nn.one_hot(k, len(features), axis=0)  # (L, R)
    return jnp.einsum('lr...,lr->r...', outs, onehot)
