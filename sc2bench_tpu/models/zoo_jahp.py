"""Joint autoregressive + hierarchical prior image codec (mbt2018).

The 4th neural input-compression family the reference resolves from the
CompressAI zoo (`joint_autoregressive_hierarchical_prior`, SURVEY.md §2.3).
Training forward is fully parallel on TPU (teacher-forced masked conv over
noisy y_hat). Deployment entropy coding is *serial by construction* (each
position's Gaussian params depend on previously decoded neighbors); the
raster-scan loop runs on host in numpy with the rANS coder — the same
placement as the reference's CPU autoregressive decode.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.entropy.factorized import EntropyBottleneck
from ..ops.entropy.gaussian import GaussianConditional
from ..ops.gdn import GDN1
from ..registry import register_model


def _conv(ch, k, s, name):
    p = k // 2
    return nn.Conv(ch, (k, k), (s, s), ((p, p), (p, p)), use_bias=True,
                   name=name)


def _deconv(ch, k, s, name):
    # flax pad pairs map to output cropping as crop = (k-1) - pad, so the
    # torch-equivalent (padding=k//2, output_padding=s-1, out = H*s) is:
    lo = k - 1 - k // 2
    hi = lo + (s - 1)
    return nn.ConvTranspose(ch, (k, k), (s, s), ((lo, hi), (lo, hi)),
                            use_bias=True, name=name)


class MaskedConv2d(nn.Module):
    """5x5 'A'-mask conv: each output position sees only strictly-previous
    raster positions of the input."""

    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mask = np.ones((k, k, 1, 1), np.float32)
        mask[k // 2, k // 2:] = 0
        mask[k // 2 + 1:] = 0
        p = k // 2
        y = jax.lax.conv_general_dilated(
            x, kernel * jnp.asarray(mask), (1, 1), ((p, p), (p, p)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias


class JointAutoregressiveCodec(nn.Module):
    """mbt2018: hyperprior + masked-conv context model + entropy-parameters
    network producing per-element Gaussian (scale, mean)."""

    n: int = 192
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
        act = lambda x: nn.leaky_relu(x, 0.01)  # noqa: E731
        self.h_a = nn.Sequential([
            _conv(self.n, 3, 1, 'h_a0'), act,
            _conv(self.n, 5, 2, 'h_a1'), act,
            _conv(self.n, 5, 2, 'h_a2'),
        ])
        self.h_s = nn.Sequential([
            _deconv(self.m, 5, 2, 'h_s0'), act,
            _deconv(self.m * 3 // 2, 5, 2, 'h_s1'), act,
            _conv(self.m * 2, 3, 1, 'h_s2'),
        ])
        self.context_prediction = MaskedConv2d(2 * self.m)
        self.entropy_parameters = nn.Sequential([
            nn.Conv(self.m * 10 // 3, (1, 1), name='ep0'), act,
            nn.Conv(self.m * 8 // 3, (1, 1), name='ep1'), act,
            nn.Conv(self.m * 2, (1, 1), name='ep2'),
        ])
        self.entropy_bottleneck = EntropyBottleneck(channels=self.n)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, mode: str = 'train', train: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        eb_mode = 'noise' if mode == 'train' else 'dequantize'
        z_hat, z_lik = self.entropy_bottleneck(z, mode=eb_mode)
        hyper = self.h_s(z_hat)
        rng = self.make_rng('noise') if mode == 'train' else None
        if mode == 'train':
            from ..ops.math import quantize_noise
            y_hat = quantize_noise(y, rng)
        else:
            y_hat = jnp.round(y)
        ctx = self.context_prediction(y_hat)
        params = self.entropy_parameters(
            jnp.concatenate([hyper, ctx], axis=-1))
        scales, means = jnp.split(params, 2, axis=-1)
        y_lik = self.gaussian_conditional.likelihood(y_hat, scales, means)
        self.sow('entropy', 'eb_out', (z_hat, z_lik))
        self.sow('entropy', 'gc_out', (y_hat, y_lik))
        return self.g_s(y_hat)

    # -- deploy device-side pieces ---------------------------------------
    def encode_ops(self, x, z_medians):
        """Device half: y, z symbols, hyper params. The autoregressive
        means/scales are produced host-side during the raster scan."""
        y = self.g_a(x)
        z = self.h_a(y)
        z_symbols = jnp.round(z - z_medians).astype(jnp.int32)
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        hyper = self.h_s(z_hat)
        return {'y': y, 'z_symbols': z_symbols, 'hyper': hyper}

    def hyper_from_z(self, z_symbols, z_medians):
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        return self.h_s(z_hat)

    def decode_image(self, y_hat):
        return self.g_s(y_hat)


class _HostAutoregressive:
    """Numpy raster-scan evaluation of context + entropy-parameters at one
    position (the serial half of mbt2018 coding)."""

    def __init__(self, params):
        p = jax.device_get(params)
        self.ctx_kernel = np.asarray(p['context_prediction']['kernel'])
        k = self.ctx_kernel.shape[0]
        mask = np.ones((k, k, 1, 1), np.float32)
        mask[k // 2, k // 2:] = 0
        mask[k // 2 + 1:] = 0
        self.ctx_kernel = self.ctx_kernel * mask
        # only the causal (unmasked) kernel positions contribute — gather
        # 12 of 25 taps and hit BLAS with the packed (b, 12*c) matmul
        causal = np.argwhere(mask[:, :, 0, 0] > 0)
        self._causal_dr = np.ascontiguousarray(causal[:, 0])
        self._causal_dc = np.ascontiguousarray(causal[:, 1])
        self._ctx_kernel_causal = np.ascontiguousarray(
            self.ctx_kernel[self._causal_dr, self._causal_dc].reshape(
                -1, self.ctx_kernel.shape[-1]))
        self.ctx_bias = np.asarray(p['context_prediction']['bias'])
        # Sequential children with explicit names live at the parent's top
        # level in flax param trees ('ep0'..'ep2', not under a scope)
        self.ep = [(np.asarray(p[f'ep{i}']['kernel'])[0, 0],
                    np.asarray(p[f'ep{i}']['bias'])) for i in range(3)]
        self.k = k

    def params_at(self, y_hat_padded, hyper, i, j):
        """y_hat_padded: (H+k-1, W+k-1, M) with k//2 halo; returns
        (scales, means) at (i, j)."""
        scales, means = self.params_at_batch(
            y_hat_padded, hyper, np.asarray([i]), np.asarray([j]))
        return scales[0], means[0]

    def params_at_batch(self, y_hat_padded, hyper, ii, jj):
        """Vectorized context + entropy-parameters at positions
        (ii[b], jj[b]) — one call per wavefront instead of per pixel.
        Positions in a batch must not depend on each other (guaranteed by
        the wavefront schedule)."""
        taps = y_hat_padded[ii[:, None] + self._causal_dr[None, :],
                            jj[:, None] + self._causal_dc[None, :], :]
        ctx = taps.reshape(len(ii), -1) @ self._ctx_kernel_causal \
            + self.ctx_bias
        feat = np.concatenate([hyper[ii, jj], ctx], axis=1)
        for li, (w, b) in enumerate(self.ep):
            feat = feat @ w + b
            if li < 2:
                feat = np.where(feat > 0, feat, 0.01 * feat)
        half = feat.shape[1] // 2
        return feat[:, :half], feat[:, half:]


from .zoo_jahp_device import JointAutoregressiveDeviceMixin


class JointAutoregressiveRuntime(JointAutoregressiveDeviceMixin):
    """compress()/decompress() with host raster-scan coding, plus the
    fused TPU wavefront wire (`encode_device_wire`/`decode_device_wire`,
    zoo_jahp_device.py)."""

    def __init__(self, module, variables):
        from .runtime import FactorizedCodec
        from ..ops.entropy.tables import build_gaussian_tables
        from ..ops.rans.coder import RansCoder
        from ..ops.entropy.gaussian import get_scale_table
        self.module = module
        self.variables = variables
        self.codec = FactorizedCodec(bottleneck_path='')
        self.scale_table = get_scale_table()
        self.g_tables = build_gaussian_tables(self.scale_table)
        self.g_coder = RansCoder(self.g_tables.quantized_cdf,
                                 self.g_tables.cdf_length,
                                 self.g_tables.offset)
        self._jit = {}
        self.host_ar = _HostAutoregressive(variables['params'])

    def update(self):
        from ..ops.entropy.factorized import EntropyBottleneck
        eb = EntropyBottleneck(channels=self.module.n)
        self.codec.update(self.module, self.variables, eb)
        self._medians_dev = jnp.asarray(self.codec.tables.medians)
        t = self.codec.tables
        self._z_cdf = jnp.asarray(t.quantized_cdf, jnp.int32)
        self._z_len = jnp.asarray(t.cdf_length, jnp.int32)
        self._z_off = jnp.asarray(t.offset, jnp.int32)
        return True

    def _jitted(self, name, fn):
        if name not in self._jit:
            self._jit[name] = jax.jit(fn)
        return self._jit[name]

    def _index_of_scale(self, scale):
        s = max(float(scale), 0.11)
        return int(np.sum(s > self.scale_table[:-1]))

    def _indexes_of_scales(self, scales):
        """Vectorized scale-table lookup, identical to _index_of_scale:
        count of table entries strictly below max(s, table_min)."""
        s = np.maximum(scales, 0.11)
        return np.searchsorted(self.scale_table[:-1], s,
                               side='left').astype(np.int32)

    def _wavefronts(self, h, w):
        """Anti-diagonal schedule d = a*i + j with a = k//2 + 1: every
        causal dependency of (i, j) under the masked k x k context kernel
        (same row left of j; rows above, all columns within the halo) has a
        strictly smaller d, so all positions of one wavefront are coded in
        parallel. ~a*h + w wavefronts instead of h*w sequential pixels."""
        a = self.host_ar.k // 2 + 1
        fronts = []
        for d in range(a * (h - 1) + w):
            ii = np.arange(max(0, (d - w + 1 + a - 1) // a),
                           min(h, d // a + 1))
            jj = d - a * ii
            keep = (jj >= 0) & (jj < w)
            if np.any(keep):
                fronts.append((ii[keep], jj[keep]))
        return fronts

    def compress(self, x):
        ops = self._jitted('enc', lambda v, x, m: self.module.apply(
            v, x, m, method=self.module.encode_ops))(
            self.variables, jnp.asarray(x, jnp.float32), self._medians_dev)
        y = np.asarray(ops['y'])[0]
        z_symbols = np.asarray(ops['z_symbols'])
        hyper = np.asarray(ops['hyper'])[0]
        h, w, m = y.shape
        k2 = self.host_ar.k // 2
        y_hat = np.zeros((h + 2 * k2, w + 2 * k2, m), np.float32)
        symbols, indexes = [], []
        for ii, jj in self._wavefronts(h, w):
            scales, means = self.host_ar.params_at_batch(
                y_hat, hyper, ii, jj)
            sym = np.round(y[ii, jj] - means).astype(np.int32)
            y_hat[ii + k2, jj + k2] = sym + means
            symbols.append(sym.ravel())
            indexes.append(self._indexes_of_scales(scales).ravel())
        self._last_y_hat = y_hat[k2:k2 + h, k2:k2 + w].copy()  # test hook
        y_strings = [self.g_coder.encode_with_indexes(
            np.concatenate(symbols), np.concatenate(indexes))]
        z_strings = self.codec.compress_symbols(z_symbols)
        return {'strings': [y_strings, z_strings],
                'shape': tuple(z_symbols.shape[1:3])}

    def decompress(self, strings, shape):
        from ..ops.rans.coder import StreamingDecoder
        z_symbols = self.codec.decompress_symbols(
            strings[1], shape, self.module.n)
        hyper = np.asarray(self._jitted(
            'hyper', lambda v, zs, m: self.module.apply(
                v, zs, m, method=self.module.hyper_from_z))(
            self.variables, jnp.asarray(z_symbols), self._medians_dev))[0]
        h, w = hyper.shape[0], hyper.shape[1]
        m = self.module.m
        k2 = self.host_ar.k // 2
        y_hat = np.zeros((h + 2 * k2, w + 2 * k2, m), np.float32)
        # wavefront decode: per front, batch-evaluate the context model and
        # decode all of the front's symbols in one C++ streaming-rANS call
        decoder = StreamingDecoder(self.g_coder, strings[0][0])
        for ii, jj in self._wavefronts(h, w):
            scales, means = self.host_ar.params_at_batch(
                y_hat, hyper, ii, jj)
            idx = self._indexes_of_scales(scales)
            sym = decoder.decode(idx.ravel()).reshape(len(ii), m)
            y_hat[ii + k2, jj + k2] = sym + means
        y_final = y_hat[k2:k2 + h, k2:k2 + w]
        self._last_y_hat_dec = y_final.copy()  # test hook
        return self._jitted('dec_img', lambda v, y: self.module.apply(
            v, y, method=self.module.decode_image))(
            self.variables, jnp.asarray(y_final)[None])


@register_model
def joint_autoregressive_hierarchical_prior(quality=1, n=None, m=None,
                                            **kwargs):
    qn, qm = ((192, 192) if int(quality) <= 5 else (192, 320))
    return JointAutoregressiveCodec(n=n or qn, m=m or qm)


@register_model
def mbt2018(quality=1, **kwargs):
    return joint_autoregressive_hierarchical_prior(quality, **kwargs)
