"""Factorized-prior entropy bottleneck (Ballé et al., ICLR 2018, appendix 6.1).

TPU-native reimplementation of the entropy model the reference obtains from
CompressAI (`compressai.entropy_models.EntropyBottleneck`, used throughout
`/root/reference/sc2bench/models/layer.py`). The learned univariate CDF is a
per-channel composition of K monotone affine+gating stages, evaluated
vectorized over channels with batched matmuls (einsum → MXU).

Layout convention: activations are NHWC (channel-last, TPU-native); the
density model is evaluated with channels leading, shape (C, 1, M).

Three quantization modes reproduce the reference's tri-state forward
(`sc2bench/models/layer.py:529-550`):
  'noise'      — training: y + U(-0.5, 0.5)
  'dequantize' — post-update fine-tune: round(y - median) + median
  'symbols'    — deployment: integer symbols for the range coder
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..math import lower_bound, quantize_noise, softplus_inv


class EntropyBottleneck(nn.Module):
    """Learned factorized prior over the channel axis of NHWC input."""

    channels: int
    filters: Sequence[int] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        filters = (1,) + tuple(self.filters) + (1,)
        k = len(self.filters) + 1
        scale = self.init_scale ** (1.0 / k)
        matrices, biases, factors = [], [], []
        for i in range(k):
            init = softplus_inv(1.0 / scale / filters[i + 1])
            matrices.append(self.param(
                f'matrix_{i}',
                lambda rng, shape=(self.channels, filters[i + 1], filters[i]),
                v=init: jnp.full(shape, v, jnp.float32)))
            biases.append(self.param(
                f'bias_{i}',
                lambda rng, shape=(self.channels, filters[i + 1], 1):
                    jax.random.uniform(rng, shape, jnp.float32, -0.5, 0.5)))
            if i < len(self.filters):
                factors.append(self.param(
                    f'factor_{i}',
                    lambda rng, shape=(self.channels, filters[i + 1], 1):
                        jnp.zeros(shape, jnp.float32)))
        self.matrices, self.biases, self.factors = matrices, biases, factors
        self.quantiles = self.param(
            'quantiles',
            lambda rng: jnp.tile(
                jnp.asarray([[-self.init_scale, 0.0, self.init_scale]],
                            jnp.float32)[None], (self.channels, 1, 1)))

    # ---- density model -------------------------------------------------
    def logits_cumulative(self, inputs, stop_gradient: bool = False):
        """c(x) logits; `inputs` shaped (C, 1, M). sigmoid(c(x)) is the CDF."""
        # The filter dim (<= 3) lives in a Python list of (C, M) planes:
        # every device array then tiles cleanly as (sublane=C, lane=M),
        # where a (C, 3, M) tensor pads its middle dim 3 -> 8 sublanes and
        # nearly triples the HBM bytes of every materialized intermediate
        # (and of every residual the backward pass saves). The tiny
        # contraction is unrolled broadcast FMAs — no dot_general.
        planes = [inputs[:, j, :] for j in range(inputs.shape[1])]
        for i, matrix in enumerate(self.matrices):
            m = jax.nn.softplus(matrix)
            b = self.biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            if i < len(self.factors):
                f = jnp.tanh(self.factors[i])
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
            else:
                f = None
            new = []
            for o in range(m.shape[1]):
                acc = b[:, o, :]  # (C, 1) broadcasts over (C, M)
                for j, p in enumerate(planes):
                    acc = acc + m[:, o, j, None] * p
                if f is not None:
                    acc = acc + f[:, o, :] * jnp.tanh(acc)
                new.append(acc)
            planes = new
        return jnp.stack(planes, axis=1)

    def _likelihood(self, inputs):
        """P(y_hat) = c(y+.5) - c(y-.5), computed with the sign trick for
        numerical stability in the tails. `inputs` shaped (C, 1, M).
        Both edges are evaluated in ONE stacked density pass (the stage
        weights are shared; halves the kernel count)."""
        m = inputs.shape[-1]
        both = self.logits_cumulative(
            jnp.concatenate([inputs - 0.5, inputs + 0.5], axis=-1))
        lower, upper = both[..., :m], both[..., m:]
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def medians(self):
        """Per-channel medians of the learned density, shape (C,)."""
        return self.quantiles[:, 0, 1]

    # ---- forward -------------------------------------------------------
    def __call__(self, x, mode: str = 'noise',
                 rng: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
        """Returns (y_hat, likelihoods), both shaped like `x` (NHWC)."""
        n, h, w, c = x.shape
        assert c == self.channels, f'channel mismatch {c} != {self.channels}'
        medians = jax.lax.stop_gradient(self.medians())
        if mode == 'noise':
            if rng is None:
                rng = self.make_rng('noise')
            y_hat = quantize_noise(x, rng)
        elif mode == 'dequantize':
            y_hat = jnp.round(x - medians) + medians
        else:
            raise ValueError(f'unknown mode: {mode}')
        # (N,H,W,C) -> (C,1,NHW) for the channelwise density model.
        # This path is transcendental-bound (~28 tanh/sigmoid per element
        # across both interval edges), not memory- or fusion-bound: a fused
        # Pallas kernel was measured SLOWER than this XLA form (see
        # docs/performance.md "negative results"), so plain XLA is the
        # optimal backend here.
        flat = jnp.transpose(y_hat.reshape(-1, c))[:, None, :]
        likelihood = self._likelihood(flat)
        likelihood = lower_bound(likelihood, self.likelihood_bound)
        likelihood = jnp.transpose(likelihood[:, 0, :]).reshape(n, h, w, c)
        return y_hat, likelihood

    def aux_loss(self):
        """Quantile loss trained by the aux optimizer (reference train loop:
        `script/task/image_classification.py:75-77`). Gradients flow only to
        `quantiles`; the density parameters are detached, matching the
        reference's aux-optimizer parameter-group split."""
        logits = self.logits_cumulative(self.quantiles, stop_gradient=True)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.asarray([[-t, 0.0, t]], jnp.float32)[None]
        return jnp.sum(jnp.abs(logits - target))
