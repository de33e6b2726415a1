"""Support transforms: adaptive padding, tensor quantizers, collation.

Parity surface of `/root/reference/sc2bench/transforms/misc.py`. The
quantizers implement the CR+BQ "BQ" stage: FP16 truncation or INT8
Jacob-style affine quantization (reference `misc.py:182-231`, torchdistill
`quantize_tensor`). AdaptivePad keeps H,W divisible by the codec's total
stride (reference `misc.py:106-154`) — in the TPU build it pads to *static*
bucketed shapes so jit does not recompile per image size.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..registry import register_transform


@register_transform
class ClearTargetTransform:
    """Drops the target, keeping the sample only (reference `misc.py:86`)."""

    def __call__(self, sample, *args):
        return sample, None


@register_transform
class AdaptivePad:
    """Pad H,W (NHWC or HWC) up to a multiple of `factor`
    (reference `misc.py:106-154`). `fill` value 0; returns padded array and,
    if `returns_org_patch_size`, the original (h, w) for crop-back."""

    def __init__(self, fill=0, padding_position='hw', factor=128,
                 returns_org_patch_size=False, centered=False, **kwargs):
        self.fill = fill
        self.factor = factor
        self.returns_org_patch_size = returns_org_patch_size
        self.centered = centered

    def padded_size(self, h, w):
        f = self.factor
        return (-(-h // f)) * f, (-(-w // f)) * f

    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        ph, pw = self.padded_size(h, w)
        dh, dw = ph - h, pw - w
        if self.centered:
            pads = ((dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0))
        else:
            pads = ((0, dh), (0, dw), (0, 0))
        if x.ndim == 4:
            pads = ((0, 0),) + pads
        out = jnp.pad(x, pads, constant_values=self.fill)
        if self.returns_org_patch_size:
            return out, (h, w)
        return out


def quantize_tensor(x, num_bits: int = 8):
    """Jacob et al. affine quantization (torchdistill `quantize_tensor`
    semantics used by reference `misc.py:209-231`): asymmetric, zero-point
    from the min, values rounded and clamped to [0, 2^b - 1]."""
    x = np.asarray(x, np.float32)
    qmin, qmax = 0.0, 2.0 ** num_bits - 1.0
    min_val, max_val = float(x.min()), float(x.max())
    scale = (max_val - min_val) / (qmax - qmin) if max_val > min_val else 1.0
    initial_zero_point = qmin - min_val / scale
    zero_point = int(np.clip(round(initial_zero_point), qmin, qmax))
    q = np.clip(np.round(zero_point + x / scale), qmin, qmax)
    dtype = np.uint8 if num_bits == 8 else np.int32
    return {'tensor': q.astype(dtype), 'scale': np.float32(scale),
            'zero_point': np.int32(zero_point)}


def dequantize_tensor(q) -> np.ndarray:
    return q['scale'] * (q['tensor'].astype(np.float32)
                         - np.float32(q['zero_point']))


@register_transform
class SimpleQuantizer:
    """FP16 (num_bits=16) via dtype cast or INT8 affine quantization
    (reference `misc.py:182-207`). Output is the pickled-size-accounted
    compressed object."""

    def __init__(self, num_bits=8, **kwargs):
        self.num_bits = num_bits

    def __call__(self, z):
        if self.num_bits == 16:
            return np.asarray(z, np.float16)
        return quantize_tensor(z, self.num_bits)


@register_transform
class SimpleDequantizer:
    """Inverse of `SimpleQuantizer` (reference `misc.py:209-231`)."""

    def __init__(self, num_bits=8, **kwargs):
        self.num_bits = num_bits

    def __call__(self, z):
        if self.num_bits == 16:
            return np.asarray(z, np.float32)
        return dequantize_tensor(z)


@register_transform
class CustomToTensor:
    """PIL/uint8 HWC -> float32 HWC in [0,1] (NHWC convention; the reference
    converts to CHW, `misc.py:158-179`)."""

    def __init__(self, converts_sample=True, converts_target=True, **kwargs):
        self.converts_sample = converts_sample
        self.converts_target = converts_target

    def __call__(self, sample, target=None):
        if self.converts_sample:
            sample = np.asarray(sample, np.float32) / 255.0
        if target is not None and self.converts_target:
            target = np.asarray(target, np.int64)
        if target is None:
            return sample
        return sample, target


@dataclasses.dataclass
class Normalize:
    """Channel-wise (x - mean) / std on HWC float arrays."""

    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)

    def __call__(self, x):
        mean = np.asarray(self.mean, np.float32)
        std = np.asarray(self.std, np.float32)
        return (np.asarray(x, np.float32) - mean) / std


register_transform(Normalize)


def default_collate_w_pil(batch):
    """Stack arrays, pass PIL images (and other objects) through as lists
    (reference `misc.py:31-82`)."""
    first = batch[0]
    if isinstance(first, (tuple, list)):
        return tuple(default_collate_w_pil(list(s)) for s in zip(*batch))
    if isinstance(first, np.ndarray):
        return np.stack(batch)
    if isinstance(first, (int, float)):
        return np.asarray(batch)
    return list(batch)
