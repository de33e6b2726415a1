#!/usr/bin/env python
"""Micro-profile of the RoI stage at the detection deploy geometry:
multiscale_roi_align gather vs box-head matmuls, f32 vs bf16 feature
table, alternative gather formulations. Ad-hoc; true force-sync timing.

    python script/profile_roi.py [n_iter]
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

from sc2bench_tpu.ops.roi_align import multiscale_roi_align  # noqa: E402


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
    print(f'{name:34s} {ms:7.2f} ms', flush=True)
    return ms


def main(n=20):
    rng = np.random.default_rng(0)
    hw = (800, 1344)
    # P2..P5 at strides 4/8/16/32 + R=1000 proposals
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

    ms_align = bench('roi_align f32', lambda fs, b: multiscale_roi_align(
        fs, b, 7, scales), (feats, boxes), n)

    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    bench('roi_align bf16 table', lambda fs, b: multiscale_roi_align(
        fs, b, 7, scales), (feats16, boxes), n)

    # box head matmuls alone (f32 and bf16)
    k1 = jnp.asarray(rng.normal(size=(12544, 1024)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(1024, 1024)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(1024, 91 * 5)).astype(np.float32))
    pooled = jnp.asarray(
        rng.normal(size=(1000, 12544)).astype(np.float32))

    def head(p, a, b, c):
        h = jax.nn.relu(p @ a)
        h = jax.nn.relu(h @ b)
        return h @ c
    bench('box head f32', head, (pooled, k1, k2, k3), n)
    bench('box head bf16', head,
          (pooled.astype(jnp.bfloat16), k1.astype(jnp.bfloat16),
           k2.astype(jnp.bfloat16), k3.astype(jnp.bfloat16)), n)

    # gather-only: the 784k-row take against the flattened table
    c = 256
    table = jnp.concatenate([f.reshape(-1, c) for f in feats])
    idx = jnp.asarray(rng.integers(0, table.shape[0],
                                   4 * 1000 * 7 * 7 * 4), jnp.int32)
    bench('bare take 784k rows f32',
          lambda t, i: jnp.take(t, i, axis=0).sum(0), (table, idx), n)
    bench('bare take 784k rows bf16',
          lambda t, i: jnp.take(t, i, axis=0).sum(0),
          (table.astype(jnp.bfloat16), idx), n)
    # one gather per sample point (196k rows), 4-tap arithmetic after
    idx1 = idx[:1000 * 7 * 7 * 4]
    bench('bare take 196k rows f32',
          lambda t, i: jnp.take(t, i, axis=0).sum(0), (table, idx1), n)
    print(f'(roi_align f32 total was {ms_align:.2f} ms)')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
