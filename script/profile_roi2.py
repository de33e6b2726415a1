#!/usr/bin/env python
"""A/B of multiscale RoI-align formulations at the deploy shape.

    python script/profile_roi2.py [n_iter]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sc2bench_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sc2bench_tpu.ops.roi_align import multiscale_roi_align, _fpn_level  # noqa: E402


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(jnp.sum(jnp.ravel(leaf).astype(jnp.float32)[:8]))


def bench(name, fn, args, n):
    f = jax.jit(fn)
    r = f(*args)
    force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    force(r)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f'{name:40s} {ms:7.2f} ms', flush=True)
    return ms


def msra_quad(features, boxes, output_size, scales, sampling_ratio=2,
              canonical_scale=224, canonical_level=4, gather_dtype=None):
    """Quad-row-table variant: per level, each row (y,x) holds the 2x2
    tap neighborhood (edge-clamped), so every bilinear sample is ONE
    row gather of 4C instead of four of C. Coordinates are clamped into
    [0, dim-1] before floor (torchvision clamp semantics — identical
    output values: out-of-range weight collapses onto the clamped tap)."""
    k = _fpn_level(boxes, len(features), canonical_scale, canonical_level)
    c = features[0].shape[-1]

    def quad(f):
        fx = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
        fy = jnp.concatenate([f[1:], f[-1:]], axis=0)
        fxy = jnp.concatenate([fy[:, 1:], fy[:, -1:]], axis=1)
        q = jnp.stack([f, fx, fy, fxy], axis=2)  # (H, W, 4, C)
        return q.reshape(-1, 4, c)

    table = jnp.concatenate([quad(f) for f in features])
    if gather_dtype is not None:
        table = table.astype(gather_dtype)
    hs = jnp.asarray([f.shape[0] for f in features], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    offs = jnp.asarray(
        [sum(f.shape[0] * f.shape[1] for f in features[:i])
         for i in range(len(features))], jnp.int32)
    scale_per_roi = jnp.asarray(scales, jnp.float32)[k]
    h_r, w_r, off_r = hs[k], ws[k], offs[k]

    out = output_size
    s = sampling_ratio
    box = boxes * scale_per_roi[:, None]
    x1, y1 = box[:, 0], box[:, 1]
    roi_w = jnp.maximum(box[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(box[:, 3] - y1, 1.0)
    iy = (jnp.arange(out)[None, :, None] * (roi_h / out)[:, None, None]
          + (jnp.arange(s)[None, None, :] + 0.5)
          * (roi_h / out)[:, None, None] / s + y1[:, None, None])
    ix = (jnp.arange(out)[None, :, None] * (roi_w / out)[:, None, None]
          + (jnp.arange(s)[None, None, :] + 0.5)
          * (roi_w / out)[:, None, None] / s + x1[:, None, None])
    ys = jnp.broadcast_to(iy[:, :, None, :, None],
                          (boxes.shape[0], out, out, s, s))
    xs = jnp.broadcast_to(ix[:, None, :, None, :],
                          (boxes.shape[0], out, out, s, s))
    hf = h_r.astype(jnp.float32)[:, None, None, None, None]
    wf = w_r.astype(jnp.float32)[:, None, None, None, None]
    valid = (ys >= -1.0) & (ys <= hf) & (xs >= -1.0) & (xs <= wf)
    # clamp-before-floor: weight on the clamped-away tap becomes 0
    ysc = jnp.clip(ys, 0.0, hf - 1)
    xsc = jnp.clip(xs, 0.0, wf - 1)
    y0 = jnp.floor(ysc)
    x0 = jnp.floor(xsc)
    wy1, wx1 = ysc - y0, xsc - x0
    wy0, wx0 = 1 - wy1, 1 - wx1
    h_i = h_r[:, None, None, None, None]
    w_i = w_r[:, None, None, None, None]
    off_i = off_r[:, None, None, None, None]
    yi = jnp.clip(y0.astype(jnp.int32), 0, h_i - 1)
    xi = jnp.clip(x0.astype(jnp.int32), 0, w_i - 1)
    idx = (off_i + yi * w_i + xi).reshape(-1)
    rows = jnp.take(table, idx, axis=0).reshape(*y0.shape, 4, c)
    wgt = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                    axis=-1)
    samples = jnp.einsum('...tc,...t->...c', rows.astype(jnp.float32),
                         wgt) * valid[..., None]
    return jnp.mean(samples, axis=(3, 4))


def main(n=20):
    rng = np.random.default_rng(0)
    hw = (800, 1344)
    shapes = [(hw[0] // s, hw[1] // s, 256) for s in (4, 8, 16, 32)]
    feats = [jnp.asarray(rng.normal(size=s).astype(np.float32))
             for s in shapes]
    cx = rng.uniform(0, hw[1], 1000)
    cy = rng.uniform(0, hw[0], 1000)
    bw = rng.uniform(8, 600, 1000)
    bh = rng.uniform(8, 600, 1000)
    boxes = np.stack([np.clip(cx - bw / 2, 0, hw[1]),
                      np.clip(cy - bh / 2, 0, hw[0]),
                      np.clip(cx + bw / 2, 0, hw[1]),
                      np.clip(cy + bh / 2, 0, hw[0])], 1).astype(np.float32)
    boxes = jnp.asarray(boxes)
    scales = [1.0 / (hw[0] / f.shape[0]) for f in feats]

    # numerical agreement first (jitted: eager op-by-op dispatch over the
    # tunnel costs minutes)
    a = np.asarray(jax.jit(
        lambda fs, bx: multiscale_roi_align(fs, bx, 7, scales))(
        feats, boxes))
    b = np.asarray(jax.jit(
        lambda fs, bx: msra_quad(fs, bx, 7, scales))(feats, boxes))
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    print(f'quad rel err vs current: {err:.2e}', flush=True)

    bench('current (4-tap gather)',
          lambda fs, b: multiscale_roi_align(fs, b, 7, scales),
          (feats, boxes), n)
    bench('quad table f32',
          lambda fs, b: msra_quad(fs, b, 7, scales), (feats, boxes), n)
    bench('quad table bf16 rows',
          lambda fs, b: msra_quad(fs, b, 7, scales,
                                  gather_dtype=jnp.bfloat16),
          (feats, boxes), n)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
