"""Pure-torch golden replica of CompressAI's entropy-model numerics.

CompressAI is not installable in this offline image, but torch is — so this
module re-derives, in torch float32 with CompressAI's exact op order, the
algorithms the reference relies on through `compressai.entropy_models`
(`/root/reference/sc2bench/models/layer.py:2-6,388-398,698-720`, SURVEY.md
§3.5):

  * `golden_pmf_to_quantized_cdf` — the C++ `_CXX.pmf_to_quantized_cdf`
    semantics (float32 round, integer renormalization by truncating
    division, final entry pinned to 2^precision, zero-width intervals fixed
    by stealing from the lowest-frequency symbol with freq > 1).
  * `GoldenEntropyBottleneck` — the factorized prior's learned CDF MLP,
    tri-state quantization, `update()` table build, likelihoods.
  * `GoldenGaussianConditional` — erfc-based standardized cumulative,
    scale-table `update()`, `build_indexes`.

`tests/test_parity_golden.py` asserts the JAX/numpy production stack in
`sc2bench_tpu.ops` produces bit-identical quantized CDF tables, identical
symbols, and likelihoods within 1e-6 of this oracle — the offline proxy for
the ±0.1% bpp/top-1 parity target (BASELINE.md).

This file intentionally uses torch only (no jax): it doubles as the CPU
reference implementation for `script/bench_reference.py`.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def golden_pmf_to_quantized_cdf(pmf: torch.Tensor,
                                precision: int = 16) -> torch.Tensor:
    """CompressAI C++ `pmf_to_quantized_cdf` semantics over a 1-D float32
    pmf (tail mass already appended). Returns int32 cdf, len(pmf)+1."""
    pmf = pmf.float()
    total_mass = 1 << precision
    freqs = torch.round(pmf * float(total_mass)).to(torch.int64)
    total = int(freqs.sum().item())
    if total == 0:
        raise ValueError('pmf sums to zero')
    freqs = (total_mass * freqs) // total          # truncating int division
    cdf = torch.zeros(len(pmf) + 1, dtype=torch.int64)
    cdf[1:] = torch.cumsum(freqs, 0)
    cdf[-1] = total_mass
    cdf = cdf.tolist()
    for i in range(len(cdf) - 1):
        if cdf[i] == cdf[i + 1]:
            best_freq, best_steal = None, -1
            for j in range(len(cdf) - 1):
                freq = cdf[j + 1] - cdf[j]
                if freq > 1 and (best_freq is None or freq < best_freq):
                    best_freq, best_steal = freq, j
            if best_steal < 0:
                raise ValueError('cannot normalize pmf')
            if best_steal < i:
                for j in range(best_steal + 1, i + 1):
                    cdf[j] -= 1
            else:
                for j in range(i + 1, best_steal + 1):
                    cdf[j] += 1
    out = torch.tensor(cdf, dtype=torch.int32)
    assert out[0] == 0 and out[-1] == total_mass
    assert bool((out[1:] > out[:-1]).all()), 'zero-frequency symbol survived'
    return out


def _pmf_to_cdf(pmf, tail_mass, pmf_length, max_length, precision=16):
    """CompressAI `EntropyModel._pmf_to_cdf`: (num_dists, max_length+2)."""
    cdf = torch.zeros((len(pmf_length), max_length + 2), dtype=torch.int32)
    for i, p in enumerate(pmf):
        prob = torch.cat((p[: int(pmf_length[i])], tail_mass[i]), dim=0)
        _cdf = golden_pmf_to_quantized_cdf(prob, precision)
        cdf[i, : _cdf.size(0)] = _cdf
    return cdf


class GoldenEntropyBottleneck(nn.Module):
    """CompressAI `EntropyBottleneck` (factorized prior), torch float32."""

    def __init__(self, channels: int, filters=(3, 3, 3, 3),
                 init_scale: float = 10.0, tail_mass: float = 1e-9,
                 likelihood_bound: float = 1e-9):
        super().__init__()
        self.channels = int(channels)
        self.filters = tuple(int(f) for f in filters)
        self.init_scale = float(init_scale)
        self.tail_mass = float(tail_mass)
        self.likelihood_bound = float(likelihood_bound)
        filters_full = (1,) + self.filters + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / filters_full[i + 1]))
            matrix = torch.full(
                (channels, filters_full[i + 1], filters_full[i]), init)
            self.register_parameter(f'matrix_{i}', nn.Parameter(matrix))
            bias = torch.empty(channels, filters_full[i + 1], 1)
            nn.init.uniform_(bias, -0.5, 0.5)
            self.register_parameter(f'bias_{i}', nn.Parameter(bias))
            if i < len(self.filters):
                factor = torch.zeros(channels, filters_full[i + 1], 1)
                self.register_parameter(f'factor_{i}', nn.Parameter(factor))
        init_q = torch.tensor([-self.init_scale, 0.0, self.init_scale])
        self.quantiles = nn.Parameter(init_q.repeat(channels, 1, 1))

    def load_numpy_params(self, params: dict):
        """Load a flax `EntropyBottleneck` param dict (same names/shapes)."""
        with torch.no_grad():
            for name, p in self.named_parameters():
                arr = np.asarray(params[name], np.float32)
                p.copy_(torch.from_numpy(arr).reshape(p.shape))
        return self

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = getattr(self, f'matrix_{i}')
            if stop_gradient:
                matrix = matrix.detach()
            logits = torch.matmul(F.softplus(matrix), logits)
            bias = getattr(self, f'bias_{i}')
            if stop_gradient:
                bias = bias.detach()
            logits = logits + bias
            if i < len(self.filters):
                factor = getattr(self, f'factor_{i}')
                if stop_gradient:
                    factor = factor.detach()
                logits = logits + torch.tanh(factor) * torch.tanh(logits)
        return logits

    def _logits_cumulative_r32(self, inputs):
        """`_logits_cumulative` with correctly-rounded float32 semantics:
        transcendentals and matmul evaluate in f64 and round to f32, plain
        elementwise ops stay f32 (IEEE-exact). Used by `update()` so the
        quantized tables are backend-independent bit-for-bit — the same
        rounding points as `ops/entropy/tables.py::_logits_cumulative_np`.
        (Real CompressAI evaluates in native torch f32; any deviation is
        ≤1 ulp before the 16-bit quantization.)"""
        logits = inputs.float()
        for i in range(len(self.filters) + 1):
            m = F.softplus(
                getattr(self, f'matrix_{i}').detach().double()).float()
            logits = torch.matmul(m.double(), logits.double()).float()
            logits = logits + getattr(self, f'bias_{i}').detach()
            if i < len(self.filters):
                f = torch.tanh(
                    getattr(self, f'factor_{i}').detach().double()).float()
                t = torch.tanh(logits.double()).float()
                logits = logits + f * t
        return logits

    def medians(self):
        return self.quantiles[:, 0, 1].detach()

    def quantize(self, x_chw_last, mode: str, means=None):
        """x shaped (C, 1, M) channels-leading (CompressAI layout)."""
        if mode == 'noise':
            noise = torch.empty_like(x_chw_last).uniform_(-0.5, 0.5)
            return x_chw_last + noise
        outputs = x_chw_last.clone()
        if means is not None:
            outputs = outputs - means
        outputs = torch.round(outputs)
        if mode == 'dequantize':
            if means is not None:
                outputs = outputs + means
            return outputs
        assert mode == 'symbols'
        return outputs.int()

    def _likelihood(self, values):
        lower = self._logits_cumulative(values - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(values + 0.5, stop_gradient=False)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(
            torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))

    def likelihood_nhwc(self, y_hat_nhwc: np.ndarray) -> np.ndarray:
        """Likelihoods for an NHWC array of (already-quantized) values."""
        x = torch.from_numpy(np.array(y_hat_nhwc, np.float32, copy=True))
        n, h, w, c = x.shape
        flat = x.reshape(-1, c).T[:, None, :]          # (C, 1, NHW)
        like = self._likelihood(flat)
        like = torch.clamp(like, min=self.likelihood_bound)
        return like[:, 0, :].T.reshape(n, h, w, c).detach().numpy()

    @torch.no_grad()
    def update(self, precision: int = 16):
        """CompressAI `EntropyBottleneck.update()`: returns
        (quantized_cdf, cdf_length, offset, medians) as numpy."""
        medians = self.quantiles[:, 0, 1]
        minima = torch.clamp(
            torch.ceil(medians - self.quantiles[:, 0, 0]).int(), min=0)
        maxima = torch.clamp(
            torch.ceil(self.quantiles[:, 0, 2] - medians).int(), min=0)
        pmf_start = medians - minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max().item())
        samples = torch.arange(max_length)
        samples = samples[None, :] + pmf_start[:, None, None]
        lower = self._logits_cumulative_r32(samples - 0.5)
        upper = self._logits_cumulative_r32(samples + 0.5)
        sign = -torch.sign(lower + upper)

        def sig32(v):
            return torch.sigmoid(v.double()).float()

        pmf = torch.abs(sig32(sign * upper) - sig32(sign * lower))
        pmf = pmf[:, 0, :]
        tail_mass = sig32(lower[:, 0, :1]) + sig32(-upper[:, 0, -1:])
        cdf = _pmf_to_cdf(pmf, tail_mass, pmf_length, max_length, precision)
        return (cdf.numpy(), (pmf_length + 2).numpy().astype(np.int32),
                (-minima).numpy().astype(np.int32),
                medians.detach().numpy().astype(np.float32))


def golden_scale_table(minimum=0.11, maximum=256.0, levels=64):
    """CompressAI `get_scale_table`."""
    return torch.exp(torch.linspace(
        math.log(minimum), math.log(maximum), levels))


class GoldenGaussianConditional:
    """CompressAI `GaussianConditional` table build + indexes, torch f32."""

    def __init__(self, scale_table=None, scale_bound: float = 0.11,
                 tail_mass: float = 1e-9):
        self.scale_table = (golden_scale_table() if scale_table is None
                            else torch.as_tensor(scale_table).float())
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)

    @staticmethod
    def _standardized_cumulative(inputs):
        half = float(0.5)
        const = float(-(2 ** -0.5))
        return half * torch.erfc(const * inputs)

    @staticmethod
    def _standardized_quantile(quantile):
        from scipy.stats import norm
        return norm.ppf(quantile)

    def likelihood(self, values, scales, means=None):
        values = torch.as_tensor(values).float()
        scales = torch.clamp(torch.as_tensor(scales).float(),
                             min=self.scale_bound)
        if means is not None:
            values = values - torch.as_tensor(means).float()
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return (upper - lower).numpy()

    @torch.no_grad()
    def update(self, precision: int = 16):
        multiplier = -self._standardized_quantile(self.tail_mass / 2)
        pmf_center = torch.ceil(self.scale_table * multiplier).int()
        pmf_length = 2 * pmf_center + 1
        max_length = int(torch.max(pmf_length).item())
        samples = torch.abs(
            torch.arange(max_length).int() - pmf_center[:, None]).float()
        samples_scale = self.scale_table.unsqueeze(1).float()

        def cum32(v):  # correctly-rounded f32 erfc (backend-independent)
            return self._standardized_cumulative(v.double()).float()

        upper = cum32((0.5 - samples) / samples_scale)
        lower = cum32((-0.5 - samples) / samples_scale)
        pmf = upper - lower
        tail_mass = 2 * lower[:, :1]
        cdf = _pmf_to_cdf(pmf, tail_mass, pmf_length, max_length, precision)
        return (cdf.numpy(), (pmf_length + 2).numpy().astype(np.int32),
                (-pmf_center).numpy().astype(np.int32),
                self.scale_table.numpy().astype(np.float32))

    def build_indexes(self, scales):
        scales = torch.clamp(torch.as_tensor(scales).float(),
                             min=self.scale_bound)
        indexes = scales.new_full(scales.size(), len(self.scale_table) - 1)
        for s in self.scale_table[:-1]:
            indexes -= (scales <= s).int()
        return indexes.int().numpy()
