"""Numeric primitives for the entropy-model stack.

TPU-first reimplementation of the math that the reference delegates to
CompressAI (see SURVEY.md §2.2): `LowerBound` with the pass-through-on-descent
gradient, uniform-noise / straight-through quantization, and 16-bit CDF
quantization for the range coder. Everything here is pure JAX (host CDF
quantization in numpy — it runs once per `update()`, off the hot path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound) with a gradient that still flows when x < bound but the
    gradient pushes x upward (CompressAI `LowerBound` semantics — needed so
    likelihoods clipped at the bound keep training signal)."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
    """min(x, bound) with pass-through gradient when pushing x downward."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0), None)


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


def ste_round(x):
    """round() with straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_noise(x, rng):
    """Training-time quantization: add U(-0.5, 0.5) noise
    (reference behavior: CompressAI `quantize(..., 'noise')` used by the
    3-mode forward in `sc2bench/models/layer.py:529-533`)."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_dequantize(x, means=None):
    """`round(x - means) + means` — deterministic dequantize mode
    (reference: `sc2bench/models/layer.py:543-549`). Differentiable via STE
    is NOT applied; callers detach as the reference does."""
    if means is None:
        return jnp.round(x)
    return jnp.round(x - means) + means


def quantize_symbols(x, means=None):
    """Integer symbols for entropy coding: round(x - means) as int32."""
    if means is not None:
        x = x - means
    return jnp.round(x).astype(jnp.int32)


def softplus_inv(y: float) -> float:
    """Inverse of softplus on floats (host-side init helper)."""
    return float(np.log(np.expm1(y)))


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Quantize a pmf (including a final tail-mass entry) to an integer CDF
    with `2**precision` total mass and no zero-frequency symbols.

    Bit-exact reimplementation of the semantics of CompressAI's C++
    `pmf_to_quantized_cdf` (invoked from the reference via
    `CompressionModel.update()`, `sc2bench/models/layer.py:388-398`):
    per-symbol `round(p * 2^precision)` in float32, integer renormalization
    by truncating division, partial sum with the final entry pinned to
    `2^precision`, then zero-width intervals widened by stealing one count
    from the lowest-frequency symbol with freq > 1 (shifting the cdf entries
    between thief and victim). Returns int32 cdf of length len(pmf)+1 with
    cdf[0]=0, cdf[-1]=2**precision. Pinned against the pure-torch golden
    oracle in `tests/test_parity_golden.py`.
    """
    pmf32 = np.asarray(pmf, dtype=np.float32)
    if np.any(pmf32 < 0) or not np.all(np.isfinite(pmf32)):
        raise ValueError('pmf must be finite and non-negative')
    total_mass = 1 << precision
    # C++: std::round(p * (1 << precision)) evaluated in float32
    freqs = np.round(pmf32 * np.float32(total_mass)).astype(np.uint64)
    total = int(freqs.sum())
    if total == 0:
        raise ValueError('pmf sums to zero')
    # integer renormalization: (2^precision * f) / total, truncating
    freqs = (np.uint64(total_mass) * freqs) // np.uint64(total)
    cdf = np.zeros(len(pmf32) + 1, dtype=np.int64)
    np.cumsum(freqs, out=cdf[1:])
    cdf[-1] = total_mass
    for i in range(len(cdf) - 1):
        if cdf[i] == cdf[i + 1]:
            # steal one count from the lowest-frequency symbol with freq > 1
            best_freq, best_steal = None, -1
            for j in range(len(cdf) - 1):
                freq = cdf[j + 1] - cdf[j]
                if freq > 1 and (best_freq is None or freq < best_freq):
                    best_freq, best_steal = freq, j
            if best_steal < 0:
                raise ValueError(
                    'cannot normalize pmf: too many symbols for precision')
            if best_steal < i:
                cdf[best_steal + 1:i + 1] -= 1
            else:
                cdf[i + 1:best_steal + 1] += 1
    assert cdf[0] == 0 and cdf[-1] == total_mass
    assert np.all(np.diff(cdf) > 0), 'zero-frequency symbol survived'
    return cdf.astype(np.int32)
