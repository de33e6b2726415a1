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


def _nms_mask_serial(boxes, scores, iou_threshold: float, max_out: int):
    """Reference greedy NMS: sequential highest-score select + suppress
    (`max_out` fori_loop steps). Kept as the semantic oracle for the tiled
    formulation below (differential-tested) and for tiny inputs."""
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


_NMS_TILE = 512


def nms_mask(boxes, scores, iou_threshold: float, max_out: int):
    """Static-shape greedy NMS: returns (indices (max_out,),
    keep_mask (max_out,)), identical to the sequential
    select-best/suppress loop (torchvision `nms` semantics, including
    first-index tie-breaking via stable sort).

    Greedy NMS on score-sorted boxes has the closed form
        kept[i] = in_support[i] and no kept j < i with iou(j, i) > t,
    whose unique solution is computed TILE-WISE: for each score-sorted
    tile, suppress by the already-resolved prefix (one (N, T) masked
    reduce), then resolve within-tile by fixed-point iteration of the
    recurrence (each step a (T, T) masked reduce; converges in at most
    the tile's suppression-chain depth — position 0 is stable
    immediately and each iteration stabilizes every position whose
    predecessors are stable, so a reached fixed point IS the greedy
    set). This replaces `max_out` sequential fori_loop steps (~10 us
    each on TPU) with N/T outer steps — measured ~5x on the RPN's
    4746-candidate deploy shape."""
    n = boxes.shape[0]
    if n <= _NMS_TILE // 2 and max_out <= 64:
        return _nms_mask_serial(boxes, scores, iou_threshold, max_out)
    t_sz = _NMS_TILE
    n_pad = -(-n // t_sz) * t_sz
    order = jnp.argsort(-scores)                 # stable: ties by index
    s_sorted = scores[order]
    b_sorted = boxes[order]
    sup = box_iou(b_sorted, b_sorted) > iou_threshold   # (n, n)
    if n_pad != n:
        sup = jnp.pad(sup, ((0, n_pad - n), (0, n_pad - n)))
    base = jnp.pad(s_sorted > -jnp.inf, (0, n_pad - n))
    pos = jnp.arange(n_pad)
    tri_t = pos[:t_sz][:, None] < pos[:t_sz][None, :]   # j<i within tile

    def outer(t, kept):
        row0 = t * t_sz
        # suppression from the resolved prefix (kept j in tiles < t)
        cols = jax.lax.dynamic_slice(sup, (0, row0), (n_pad, t_sz))
        prev = kept & (pos < row0)
        by_prev = jnp.any(cols & prev[:, None], axis=0)          # (T,)
        tile_base = jax.lax.dynamic_slice(base, (row0,), (t_sz,)) \
            & ~by_prev
        tile_sup = jax.lax.dynamic_slice(sup, (row0, row0),
                                         (t_sz, t_sz)) & tri_t

        def refine(k):
            return tile_base & ~jnp.any(tile_sup & k[:, None], axis=0)

        def cond(c):
            k, prev_k, it = c
            return jnp.any(k != prev_k) & (it < t_sz)

        def body(c):
            k, _, it = c
            return refine(k), k, it + 1

        k0 = refine(tile_base)
        k_tile, _, _ = jax.lax.while_loop(cond, body,
                                          (k0, tile_base, jnp.int32(0)))
        return jax.lax.dynamic_update_slice(kept, k_tile, (row0,))

    kept = jax.lax.fori_loop(0, n_pad // t_sz, outer,
                             jnp.zeros((n_pad,), bool))
    # first max_out kept, in score order, mapped back to input indices
    priority = jnp.where(kept[:n], pos[:n], n)
    top = jnp.argsort(priority)[:max_out]
    out_valid = priority[top] < n
    out_idx = jnp.where(out_valid, order[top], 0).astype(jnp.int32)
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
