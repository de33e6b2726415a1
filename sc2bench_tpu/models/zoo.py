"""Neural image-compression codecs for input-compression baselines.

TPU-native equivalents of the CompressAI zoo models the reference resolves in
`/root/reference/sc2bench/models/registry.py:12-105`:
  factorized_prior (bmshj2018_factorized), scale_hyperprior
  (bmshj2018_hyperprior), mean_scale_hyperprior (mbt2018_mean), and
  joint_autoregressive_hierarchical_prior (mbt2018; serial context decode
  runs on host — it is serial by construction).

Quality preset q∈1..8 sets channel widths (N, M) like the zoo: q<=5 →
(128, 192), q>5 → (192, 320). Pretrained CompressAI weights are not
downloadable in this build; checkpoints load via `ckpt`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..analysis import AnalyzerHolder
from ..ops.entropy.factorized import EntropyBottleneck
from ..ops.entropy.gaussian import GaussianConditional
from ..ops.gdn import GDN1
from ..registry import register_model
from .runtime import FactorizedCodec, HyperpriorCodec


def _conv(ch, k, s, name):
    p = k // 2
    return nn.Conv(ch, (k, k), (s, s), ((p, p), (p, p)), use_bias=True,
                   name=name)


def _deconv(ch, k, s, name):
    # CompressAI deconv = torch ConvTranspose2d(k, s, padding=k//2,
    # output_padding=s-1) → out = H*s. Flax crops (lo, hi) off the full
    # (H-1)*s + k output; torch's symmetric padding k//2 with output_padding
    # appended at the end gives lo = k//2, hi = k - s - k//2 + (s - 1)
    # reduced: lo + hi = k - s, hi reduced by output_padding (s-1).
    # flax pad pairs map to output cropping as crop = (k-1) - pad, so the
    # torch-equivalent (padding=k//2, output_padding=s-1, out = H*s) is:
    lo = k - 1 - k // 2
    hi = lo + (s - 1)
    return nn.ConvTranspose(ch, (k, k), (s, s), ((lo, hi), (lo, hi)),
                            use_bias=True, name=name)


class FactorizedPriorCodec(nn.Module):
    """bmshj2018_factorized: 4x conv-GDN analysis, factorized prior."""

    n: int = 128
    m: int = 192

    def setup(self):
        self.g_a = nn.Sequential([
            _conv(self.n, 5, 2, 'g_a0'), GDN1(self.n, name='g_a_gdn0'),
            _conv(self.n, 5, 2, 'g_a1'), GDN1(self.n, name='g_a_gdn1'),
            _conv(self.n, 5, 2, 'g_a2'), GDN1(self.n, name='g_a_gdn2'),
            _conv(self.m, 5, 2, 'g_a3'),
        ])
        self.g_s = nn.Sequential([
            _deconv(self.n, 5, 2, 'g_s0'),
            GDN1(self.n, inverse=True, name='g_s_igdn0'),
            _deconv(self.n, 5, 2, 'g_s1'),
            GDN1(self.n, inverse=True, name='g_s_igdn1'),
            _deconv(self.n, 5, 2, 'g_s2'),
            GDN1(self.n, inverse=True, name='g_s_igdn2'),
            _deconv(3, 5, 2, 'g_s3'),
        ])
        self.entropy_bottleneck = EntropyBottleneck(channels=self.m)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        y = self.g_a(x)
        eb_mode = 'noise' if mode == 'train' else 'dequantize'
        y_hat, y_lik = self.entropy_bottleneck(y, mode=eb_mode)
        self.sow('entropy', 'eb_out', (y_hat, y_lik))
        return self.g_s(y_hat)

    def encode_ops(self, x, medians):
        y = self.g_a(x)
        return {'symbols': jnp.round(y - medians).astype(jnp.int32)}

    def decode_ops(self, symbols, medians):
        return self.g_s(symbols.astype(jnp.float32) + medians)


class ScaleHyperpriorCodec(nn.Module):
    """bmshj2018_hyperprior: adds h_a/h_s + GaussianConditional over y."""

    n: int = 128
    m: int = 192
    mean_scale: bool = False

    def setup(self):
        self.g_a = nn.Sequential([
            _conv(self.n, 5, 2, 'g_a0'), GDN1(self.n, name='g_a_gdn0'),
            _conv(self.n, 5, 2, 'g_a1'), GDN1(self.n, name='g_a_gdn1'),
            _conv(self.n, 5, 2, 'g_a2'), GDN1(self.n, name='g_a_gdn2'),
            _conv(self.m, 5, 2, 'g_a3'),
        ])
        self.g_s = nn.Sequential([
            _deconv(self.n, 5, 2, 'g_s0'),
            GDN1(self.n, inverse=True, name='g_s_igdn0'),
            _deconv(self.n, 5, 2, 'g_s1'),
            GDN1(self.n, inverse=True, name='g_s_igdn1'),
            _deconv(self.n, 5, 2, 'g_s2'),
            GDN1(self.n, inverse=True, name='g_s_igdn2'),
            _deconv(3, 5, 2, 'g_s3'),
        ])
        act = (lambda x: nn.leaky_relu(x, 0.01)) if self.mean_scale \
            else nn.relu
        self.h_a = nn.Sequential([
            _conv(self.n, 3, 1, 'h_a0'), act,
            _conv(self.n, 5, 2, 'h_a1'), act,
            _conv(self.n, 5, 2, 'h_a2'),
        ])
        if self.mean_scale:
            # mbt2018_mean: N → M → 3M/2 → 2M
            self.h_s = nn.Sequential([
                _deconv(self.m, 5, 2, 'h_s0'), act,
                _deconv(self.m * 3 // 2, 5, 2, 'h_s1'), act,
                _conv(2 * self.m, 3, 1, 'h_s2'),
            ])
        else:
            # bmshj2018_hyperprior: N → N → N → M (relu-terminated scales)
            self.h_s = nn.Sequential([
                _deconv(self.n, 5, 2, 'h_s0'), act,
                _deconv(self.n, 5, 2, 'h_s1'), act,
                _conv(self.m, 3, 1, 'h_s2'), nn.relu,
            ])
        self.entropy_bottleneck = EntropyBottleneck(channels=self.n)
        self.gaussian_conditional = GaussianConditional()

    def hyper_input(self, y):
        return y if self.mean_scale else jnp.abs(y)

    def gaussian_params(self, h):
        if self.mean_scale:
            scales, means = jnp.split(h, 2, axis=-1)
            return scales, means
        return h, None

    def __call__(self, x, mode: str = 'train', train: bool = False):
        y = self.g_a(x)
        z = self.h_a(self.hyper_input(y))
        eb_mode = 'noise' if mode == 'train' else 'dequantize'
        z_hat, z_lik = self.entropy_bottleneck(z, mode=eb_mode)
        scales, means = self.gaussian_params(self.h_s(z_hat))
        rng = self.make_rng('noise') if mode == 'train' else None
        y_hat, y_lik = self.gaussian_conditional(
            y, scales, means, mode=eb_mode, rng=rng)
        self.sow('entropy', 'eb_out', (z_hat, z_lik))
        self.sow('entropy', 'gc_out', (y_hat, y_lik))
        return self.g_s(y_hat)

    def encode_ops(self, x, z_medians, scale_table):
        y = self.g_a(x)
        z = self.h_a(self.hyper_input(y))
        z_symbols = jnp.round(z - z_medians).astype(jnp.int32)
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        scales, means = self.gaussian_params(self.h_s(z_hat))
        indexes = self.gaussian_conditional.build_indexes(scales, scale_table)
        y_symbols = (jnp.round(y - means) if means is not None
                     else jnp.round(y)).astype(jnp.int32)
        return {'y_symbols': y_symbols, 'y_indexes': indexes,
                'z_symbols': z_symbols}

    def decode_scales(self, z_symbols, z_medians, scale_table):
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        scales, means = self.gaussian_params(self.h_s(z_hat))
        indexes = self.gaussian_conditional.build_indexes(scales, scale_table)
        return indexes, means

    def decode_ops(self, y_symbols, z_symbols, z_medians):
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        scales, means = self.gaussian_params(self.h_s(z_hat))
        y_hat = y_symbols.astype(jnp.float32)
        if means is not None:
            y_hat = y_hat + means
        return self.g_s(y_hat)


class ImageCodecRuntime(AnalyzerHolder):
    """compress()/decompress() surface of a CompressAI model
    (reference call sites `sc2bench/models/wrapper.py:126-129`)."""

    def __init__(self, module, variables, analyzer_configs=None):
        super().__init__(analyzer_configs or [])
        self.module = module
        self.variables = variables
        self.hyper = isinstance(module, ScaleHyperpriorCodec)
        self.codec = HyperpriorCodec(bottleneck_path='') if self.hyper \
            else FactorizedCodec(bottleneck_path='')
        self._jit = {}
        self.updated = False

    def update(self, scale_table=None):
        eb_channels = int(self.codec.eb_params(self.variables)
                          ['quantiles'].shape[0])
        eb = EntropyBottleneck(channels=eb_channels)
        if self.hyper:
            self.codec.update(self.module, self.variables, eb, scale_table)
        else:
            self.codec.update(self.module, self.variables, eb)
        self.updated = True
        return True

    def _jitted(self, name, fn):
        if name not in self._jit:
            self._jit[name] = jax.jit(fn)
        return self._jit[name]

    def compress(self, x):
        x = jnp.asarray(x, jnp.float32)
        if self.hyper:
            ops = self._jitted('enc', lambda v, x, zm, st: self.module.apply(
                v, x, zm, st, method=self.module.encode_ops))(
                self.variables, x, jnp.asarray(self.codec.tables.medians),
                jnp.asarray(self.codec.g_tables.scale_table))
            y_strings = self.codec.compress_y(np.asarray(ops['y_symbols']),
                                              np.asarray(ops['y_indexes']))
            z_strings = self.codec.compress_symbols(
                np.asarray(ops['z_symbols']))
            return {'strings': [y_strings, z_strings],
                    'shape': tuple(np.asarray(ops['z_symbols']).shape[1:3])}
        ops = self._jitted('enc', lambda v, x, m: self.module.apply(
            v, x, m, method=self.module.encode_ops))(
            self.variables, x, jnp.asarray(self.codec.tables.medians))
        symbols = np.asarray(ops['symbols'])
        return {'strings': [self.codec.compress_symbols(symbols)],
                'shape': tuple(symbols.shape[1:3])}

    def decompress(self, strings, shape):
        if self.hyper:
            z_channels = self.module.n
            z_sym = self.codec.decompress_symbols(strings[1], shape,
                                                  z_channels)
            y_idx, _ = self._jitted('dec_scales',
                                    lambda v, zs, zm, st: self.module.apply(
                                        v, zs, zm, st,
                                        method=self.module.decode_scales))(
                self.variables, jnp.asarray(z_sym),
                jnp.asarray(self.codec.tables.medians),
                jnp.asarray(self.codec.g_tables.scale_table))
            y_sym = self.codec.decompress_y(strings[0], np.asarray(y_idx))
            return self._jitted('dec', lambda v, ys, zs, zm:
                                self.module.apply(
                                    v, ys, zs, zm,
                                    method=self.module.decode_ops))(
                self.variables, jnp.asarray(y_sym), jnp.asarray(z_sym),
                jnp.asarray(self.codec.tables.medians))
        channels = self.codec.tables.medians.shape[0]
        symbols = self.codec.decompress_symbols(strings[0], shape, channels)
        return self._jitted('dec', lambda v, s, m: self.module.apply(
            v, s, m, method=self.module.decode_ops))(
            self.variables, jnp.asarray(symbols),
            jnp.asarray(self.codec.tables.medians))

    def forward(self, x, mode='train', rng=None):
        return self.module.apply(
            self.variables, jnp.asarray(x), mode=mode,
            rngs={'noise': rng or jax.random.key(0)})


def _quality_channels(quality: int):
    return (128, 192) if quality <= 5 else (192, 320)


@register_model
def factorized_prior(quality=1, n=None, m=None, **kwargs):
    qn, qm = _quality_channels(int(quality))
    return FactorizedPriorCodec(n=n or qn, m=m or qm)


@register_model
def bmshj2018_factorized(quality=1, **kwargs):
    return factorized_prior(quality, **kwargs)


@register_model
def scale_hyperprior(quality=1, n=None, m=None, **kwargs):
    qn, qm = _quality_channels(int(quality))
    return ScaleHyperpriorCodec(n=n or qn, m=m or qm, mean_scale=False)


@register_model
def bmshj2018_hyperprior(quality=1, **kwargs):
    return scale_hyperprior(quality, **kwargs)


@register_model
def mean_scale_hyperprior(quality=1, n=None, m=None, **kwargs):
    qn, qm = _quality_channels(int(quality))
    return ScaleHyperpriorCodec(n=n or qn, m=m or qm, mean_scale=True)


@register_model
def mbt2018_mean(quality=1, **kwargs):
    return mean_scale_hyperprior(quality, **kwargs)


def build_image_codec(key: str, ckpt=None, image_size=(256, 256), **kwargs):
    """Construct + init an image codec runtime (reference
    `get_compression_model`, `registry.py:83-105`)."""
    from ..registry import get as registry_get
    module = registry_get('model', key)(**kwargs)
    x = jnp.zeros((1, *image_size, 3))
    variables = jax.jit(lambda r, x: module.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    if ckpt:
        from ..utils.ckpt import load_ckpt
        try:
            variables, _, _ = load_ckpt(ckpt, variables)
        except FileNotFoundError:
            pass
    from .zoo_jahp import (JointAutoregressiveCodec,
                           JointAutoregressiveRuntime)
    if isinstance(module, JointAutoregressiveCodec):
        # mbt2018 needs the autoregressive runtime (wavefront context
        # model drives the coder); ImageCodecRuntime's factorized path
        # would KeyError on its encode_ops contract
        rt = JointAutoregressiveRuntime(module, variables)
    else:
        rt = ImageCodecRuntime(module, variables)
    rt.update()
    return rt
