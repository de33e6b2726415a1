"""Box operations for detection, designed for static shapes under jit.

The reference relies on torchvision's CUDA NMS/RoIAlign (SURVEY.md §7 "hard
parts"). TPU-native versions: IoU/encode/decode are dense vector math; NMS is
an iterative max-select with masking (`lax.fori_loop` over a fixed detection
budget — no dynamic shapes); RoIAlign is bilinear gather over a static
sampling grid. Boxes are (x1, y1, x2, y2) in image coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_area(boxes):
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.clip(boxes[..., 3] - boxes[..., 1], 0)


def box_iou(a, b):
    """IoU matrix (N, M) for boxes a (N,4), b (M,4)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


# torchvision BoxCoder weights for Faster R-CNN.
# (math.log, not jnp.log: a module-level jnp op would eagerly initialize the
# device backend at import time — seconds to minutes over a TPU tunnel.)
import math

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def encode_boxes(reference, proposals, weights=(1.0, 1.0, 1.0, 1.0)):
    """Regression targets dx,dy,dw,dh of `reference` (gt) w.r.t.
    `proposals` (anchors) — torchvision BoxCoder.encode semantics."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) / 2
    py = (proposals[..., 1] + proposals[..., 3]) / 2
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    gx = (reference[..., 0] + reference[..., 2]) / 2
    gy = (reference[..., 1] + reference[..., 3]) / 2
    gw = jnp.maximum(reference[..., 2] - reference[..., 0], 1e-6)
    gh = jnp.maximum(reference[..., 3] - reference[..., 1], 1e-6)
    return jnp.stack([
        wx * (gx - px) / pw, wy * (gy - py) / ph,
        ww * jnp.log(gw / pw), wh * jnp.log(gh / ph)], axis=-1)


def decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply regression deltas to boxes — torchvision BoxCoder.decode."""
    wx, wy, ww, wh = weights
    px = (boxes[..., 0] + boxes[..., 2]) / 2
    py = (boxes[..., 1] + boxes[..., 3]) / 2
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, None, BBOX_XFORM_CLIP)
    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def clip_boxes(boxes, image_hw):
    h, w = image_hw
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)],
        axis=-1)


def nms_mask(boxes, scores, iou_threshold: float, max_out: int):
    """Static-shape NMS: returns (indices (max_out,), keep_mask (max_out,)).
    Iteratively selects the highest-scoring unsuppressed box and masks
    overlaps — O(max_out · N) dense work, VPU-friendly."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        alive, out_idx, out_valid = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        valid = masked[best] > -jnp.inf
        suppress = iou[best] > iou_threshold
        alive = alive & (~suppress) & valid
        out_idx = out_idx.at[i].set(best)
        out_valid = out_valid.at[i].set(valid)
        return alive, out_idx, out_valid

    alive0 = jnp.ones((n,), bool)
    idx0 = jnp.zeros((max_out,), jnp.int32)
    val0 = jnp.zeros((max_out,), bool)
    _, out_idx, out_valid = jax.lax.fori_loop(
        0, max_out, body, (alive0, idx0, val0))
    return out_idx, out_valid


def batched_nms_mask(boxes, scores, idxs, iou_threshold: float,
                     max_out: int):
    """Category-aware NMS via the coordinate-offset trick (torchvision
    `batched_nms`): boxes of different `idxs` never overlap."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, max_out)


def fast_nms_mask(boxes, scores, iou_threshold: float, max_out: int):
    """Parallel (one-shot) NMS à la YOLACT Fast NMS: sort by score, build
    the upper-triangular IoU matrix, and drop any box whose max IoU with a
    higher-scoring kept candidate exceeds the threshold. Slightly more
    aggressive than greedy NMS (suppressors may themselves be suppressed)
    but fully parallel — no sequential loop on the TPU. Same return
    contract as `nms_mask`."""
    n = boxes.shape[0]
    k = min(max(n, 1), max(4 * max_out, max_out))
    order_scores, order = jax.lax.top_k(scores, min(n, k))
    b = boxes[order]
    iou = box_iou(b, b)
    # zero the diagonal and lower triangle: compare only to higher-scored
    tri = jnp.triu(jnp.ones((b.shape[0], b.shape[0]), bool), k=1)
    max_iou = jnp.max(jnp.where(tri, iou, 0.0), axis=0)
    keep = (max_iou <= iou_threshold) & (order_scores > -jnp.inf)
    # compact kept boxes into the first max_out slots; slot max_out is a
    # sentinel row that absorbs overflow and suppressed entries
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (rank < max_out), rank, max_out)
    out_idx = jnp.zeros((max_out + 1,), jnp.int32).at[slot].set(
        order, mode='drop')[:max_out]
    out_valid = jnp.zeros((max_out + 1,), bool).at[slot].set(
        keep, mode='drop')[:max_out]
    return out_idx, out_valid


def remove_small_boxes_mask(boxes, min_size: float):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w >= min_size) & (h >= min_size)
