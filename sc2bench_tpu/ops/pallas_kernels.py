"""Pallas TPU kernels for the hot elementwise+matmul ops.

Fused GDN/IGDN: y = x / (beta + |x| @ gamma^T) (or `*` for inverse) — one
VMEM pass instead of XLA's |x| materialization + matmul + divide chain. The
channel mix rides the MXU; abs/add/divide fuse into the same tile. Used by
`ops/gdn.py` when `use_pallas=True` (auto-on for TPU backends).

Shapes: x is flattened to (M, C); C padded to the 128-lane boundary. The
kernel tiles M; gamma/beta are broadcast to every tile (they are tiny).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x, m):
    return -(-x // m) * m


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    norm = jnp.dot(jnp.abs(x), gamma_ref[:],
                   preferred_element_type=jnp.float32) + beta_ref[:]
    out_ref[:] = x * norm if inverse else x / norm


@functools.partial(jax.jit, static_argnames=('inverse', 'interpret'))
def gdn_pallas(x, gamma, beta, inverse: bool = False,
               interpret: bool = False):
    """x: (..., C); gamma: (C, C) row-major as |x| @ gamma^T; beta: (C,)."""
    orig_shape = x.shape
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    x2 = x.reshape(m, c)
    cp = _round_up(c, 128)
    mp = _round_up(max(m, 8), 8)
    if cp != c or mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, cp - c)))
    # gamma^T padded; pad beta with 1s so padded lanes divide by 1 (no nan)
    gt = jnp.pad(gamma.T, ((0, cp - c), (0, cp - c)))
    bp = jnp.pad(beta, (0, cp - c), constant_values=1.0)[None, :]

    tile_m = min(mp, 512)
    grid = (mp // tile_m,) if mp % tile_m == 0 else (-(-mp // tile_m),)
    if mp % tile_m != 0:
        x2 = jnp.pad(x2, ((0, grid[0] * tile_m - mp), (0, 0)))
        mp = grid[0] * tile_m

    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((mp, cp), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, gt, bp)
    return out[:m, :c].reshape(orig_shape)


def gdn_reference(x, gamma, beta, inverse: bool = False):
    """Plain-XLA GDN used as fallback and test oracle."""
    norm = jnp.abs(x) @ gamma.T + beta
    return x * norm if inverse else x / norm


def has_pallas() -> bool:
    return _HAS_PALLAS
