"""Conditional Gaussian entropy model (scale / mean-scale hyperprior).

TPU-native equivalent of CompressAI's `GaussianConditional` as used by the
reference's SHP/MSHP bottlenecks (`/root/reference/sc2bench/models/layer.py:
627,646-647,679,691-694,775-776`). Pure functions — the model has no learned
parameters; the 64-entry log-spaced scale table is built at `update()` time
(reference: `get_scale_table`, `layer.py:698-705`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math import lower_bound, quantize_noise

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(minimum: float = SCALES_MIN, maximum: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """Log-spaced scale table (host-side numpy)."""
    return np.exp(np.linspace(np.log(minimum), np.log(maximum), levels))


def _standardized_cumulative(x):
    """Standard normal CDF via complementary error function."""
    half = 0.5
    const = -(2.0 ** -0.5)
    return half * jax.scipy.special.erfc(const * x)


class GaussianConditional:
    """Stateless namespace of pure ops; `scale_bound` clips predicted scales."""

    def __init__(self, scale_bound: float = SCALES_MIN, tail_mass: float = 1e-9,
                 likelihood_bound: float = 1e-9):
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)
        self.likelihood_bound = float(likelihood_bound)

    def likelihood(self, x, scales, means=None):
        """P(round(x)) under N(means, scales^2) with unit-width bins."""
        if means is not None:
            x = x - means
        scales = lower_bound(scales, self.scale_bound)
        values = jnp.abs(x)
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        return lower_bound(upper - lower, self.likelihood_bound)

    def __call__(self, x, scales, means=None, mode: str = 'noise',
                 rng: jax.Array | None = None):
        """Returns (y_hat, likelihoods). Modes mirror the factorized prior."""
        if mode == 'noise':
            y_hat = quantize_noise(x, rng)
        elif mode == 'dequantize':
            if means is None:
                y_hat = jnp.round(x)
            else:
                y_hat = jnp.round(x - means) + means
        else:
            raise ValueError(f'unknown mode: {mode}')
        return y_hat, self.likelihood(y_hat, scales, means)

    def build_indexes(self, scales, scale_table: np.ndarray):
        """Map each predicted scale to its table row: the number of strictly
        smaller table entries (reference semantics: start at len-1, subtract
        one per table entry >= scale)."""
        scales = jnp.maximum(scales, self.scale_bound)
        table = jnp.asarray(scale_table[:-1], scales.dtype)
        return jnp.sum(scales[..., None] > table, axis=-1).astype(jnp.int32)
