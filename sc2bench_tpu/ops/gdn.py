"""GDN / IGDN normalization (TPU-native).

The reference uses CompressAI's `GDN1` (abs-variant of Generalized Divisive
Normalization) inside every learned bottleneck encoder/decoder
(`/root/reference/sc2bench/models/layer.py:478-494,594-607`). Here it is a
Flax module over NHWC tensors: the channel mixing `|x| @ gamma^T` is a single
MXU matmul that XLA fuses with the surrounding elementwise ops (abs, add,
divide ride the matmul's fusion group). A hand-written Pallas GDN kernel was
measured against this form in the full train step and removed: XLA's fusion
is already optimal here (docs/performance.md, "negative results").

Parameterization matches CompressAI's `NonNegativeParametrizer`:
stored = sqrt(max(value + pedestal, pedestal)); effective =
lower_bound(stored, bound)^2 - pedestal, with pedestal = 2**-18 and
bound = sqrt(minimum + pedestal).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .math import lower_bound

_PEDESTAL = 2.0 ** -18


def nonneg_init(value: np.ndarray) -> np.ndarray:
    """Transform an initial non-negative value into stored (sqrt) space."""
    return np.sqrt(np.maximum(value + _PEDESTAL, _PEDESTAL))


def nonneg_forward(stored, minimum: float):
    bound = (minimum + _PEDESTAL) ** 0.5
    return lower_bound(stored, bound) ** 2 - _PEDESTAL


class GDN1(nn.Module):
    """Simplified GDN: y = x / (beta + sum_j gamma_ij |x_j|); inverse
    multiplies instead of divides. Input layout NHWC (or any (..., C)).

    `dtype` is the compute dtype of the channel-mixing matmul (mirrors
    flax's Conv convention: params stay f32, cast at compute time).
    None keeps jnp promotion (f32 whenever params are f32) — the exact
    train/parity behavior; deploy's bf16 decode programs set bfloat16 so
    the GDN matmul rides the MXU between the bf16 convs instead of
    bouncing the activation back to f32."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = self.channels
        beta_raw = self.param(
            'beta', lambda rng: jnp.asarray(nonneg_init(np.ones(c)), jnp.float32))
        gamma_raw = self.param(
            'gamma',
            lambda rng: jnp.asarray(
                nonneg_init(self.gamma_init * np.eye(c)), jnp.float32))
        beta = nonneg_forward(beta_raw, self.beta_min)
        gamma = nonneg_forward(gamma_raw, 0.0)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            beta = beta.astype(self.dtype)
            gamma = gamma.astype(self.dtype)
        # norm_i = beta_i + sum_j gamma[i, j] * |x_j|  →  |x| @ gamma^T
        norm = jnp.abs(x) @ gamma.T + beta
        return x * norm if self.inverse else x / norm
