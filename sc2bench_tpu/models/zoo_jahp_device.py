"""Device-side (TPU) wavefront coding for the joint-autoregressive codec.

The host `JointAutoregressiveRuntime` (zoo_jahp.py) runs the mbt2018
context model in numpy and the rANS coder in C++ per wavefront — the
only codec family whose deploy path was not TPU-native (VERDICT r4
item 4). This module moves BOTH halves onto the chip:

- the anti-diagonal wavefront schedule (every causal dependency of a
  front under the masked 5x5 context kernel lies in an earlier front)
  becomes a `lax.scan` whose step evaluates the context matmul + the
  entropy-parameters MLP for the whole front at once;
- entropy coding rides a masked multi-lane rANS: lane (slot, channel)
  codes at most ONE symbol per front, so the per-front activity mask is
  STATIC (h, w) data and encode/decode renorm events stay symmetric per
  step — the time-ALIGNED stream layout of `ops/rans/device.py` applies
  unchanged (the decoder reads its chunk at column t directly);
- the in-scan symbol search over the (64, ~3k) Gaussian CDF rows is a
  fixed-depth binary search (12 two-element gathers per lane) instead
  of full-row reductions.

Wire format ("jahp-lane-v1"): z rides the cyclic aligned lane wire; y is
(N = max_front * m lanes) x (T = n_fronts) aligned chunks + states +
lengths. A DIFFERENT format from the host path's CompressAI-style wire
(which stays the measurement-protocol path); byte accounting uses this
wire's exact nbytes. Out-of-support symbols (never produced by a
trained model) flip `ok` and the caller falls back to the host coder.

Bit-exactness contract: the decode program re-evaluates the SAME
context/entropy-parameters functions (identical op sequences, f32) on
identically reconstructed y_hat, so scale indexes match the encoder's
and the round trip reproduces y_hat exactly (asserted in tests and by
the per-lane rANS validity check). Reference baseline:
`/root/reference/sc2bench/models/registry.py:12-14` (mbt2018).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.rans.device import RANS_L

_MASK16 = np.uint32((1 << 16) - 1)


def _front_arrays(fronts, h, w):
    """Pad the wavefront schedule to (T, F) ii/jj/active arrays. Inactive
    slots carry ii = -1 (scatters drop them; gathers clamp + mask)."""
    T = len(fronts)
    F = max(len(ii) for ii, _ in fronts)
    ii = np.full((T, F), -1, np.int32)
    jj = np.zeros((T, F), np.int32)
    act = np.zeros((T, F), bool)
    for t, (fi, fj) in enumerate(fronts):
        ii[t, :len(fi)] = fi
        jj[t, :len(fi)] = fj
        act[t, :len(fi)] = True
    return ii, jj, act


def _causal_taps(k):
    """(dr, dc) of the k x k 'A'-mask's nonzero positions."""
    mask = np.ones((k, k), bool)
    mask[k // 2, k // 2:] = False
    mask[k // 2 + 1:] = False
    pos = np.argwhere(mask)
    return pos[:, 0].astype(np.int32), pos[:, 1].astype(np.int32)


class _DeviceAutoregressive:
    """Traceable context + entropy-parameters evaluation for one front —
    the device twin of `zoo_jahp._HostAutoregressive` (same packed causal
    matmul, same op order)."""

    def __init__(self, params, k=5):
        self.k = k
        dr, dc = _causal_taps(k)
        self.dr, self.dc = jnp.asarray(dr), jnp.asarray(dc)
        kern = jnp.asarray(params['context_prediction']['kernel'])
        self.ctx_kernel = kern[dr, dc].reshape(-1, kern.shape[-1])
        self.ctx_bias = jnp.asarray(params['context_prediction']['bias'])
        self.ep = [(jnp.asarray(params[f'ep{i}']['kernel'])[0, 0],
                    jnp.asarray(params[f'ep{i}']['bias']))
                   for i in range(3)]

    def front_params(self, y_hat_padded, hyper, ii_t, jj_t):
        """(scales, means), each (F, m), at front positions (ii_t, jj_t)
        over the halo-padded y_hat. Inactive slots (ii < 0) are clamped;
        their outputs are masked by the caller."""
        ii = jnp.clip(ii_t, 0)
        jj = jnp.clip(jj_t, 0)
        taps = y_hat_padded[ii[:, None] + self.dr[None, :],
                            jj[:, None] + self.dc[None, :], :]
        ctx = taps.reshape(taps.shape[0], -1) @ self.ctx_kernel \
            + self.ctx_bias
        feat = jnp.concatenate([hyper[ii, jj], ctx], axis=1)
        for li, (wk, b) in enumerate(self.ep):
            feat = feat @ wk + b
            if li < 2:
                feat = jnp.where(feat > 0, feat, 0.01 * feat)
        half = feat.shape[1] // 2
        return feat[:, :half], feat[:, half:]


def _scale_indexes(scales, scale_table):
    """Device twin of `_indexes_of_scales`: #(table[:-1] entries < s),
    s floored at the table minimum."""
    s = jnp.maximum(scales, scale_table[0])
    return jnp.sum(s[..., None] > scale_table[:-1], axis=-1) \
        .astype(jnp.int32)


def _cdf_search(g_cdf, g_len, idx, slot):
    """v with cdf[idx, v] <= slot < cdf[idx, v+1] — the shared
    fixed-depth point-gather bisection (depth derived from the table
    width; see `ops.rans.device.cdf_bisect`)."""
    from ..ops.rans.device import cdf_bisect
    return cdf_bisect(g_cdf, g_len, idx, slot)


def _rans_encode_step(x, st, fr, active):
    """One masked rANS encode step for every lane (reverse front order).
    Returns (new_x, chunk, emit)."""
    fr = jnp.maximum(fr, 1)                     # inactive lanes: inert
    renorm = active & (x >= (fr << 16))
    chunk = (x & _MASK16).astype(jnp.uint16)
    x = jnp.where(renorm, x >> 16, x)
    q = (x.astype(jnp.float32) / fr.astype(jnp.float32)).astype(jnp.uint32)
    r = x - q * fr
    too_big = r >= fr
    q = jnp.where(too_big, q - 1, q)
    r = jnp.where(too_big, r + fr, r)
    still_big = r >= fr
    q = jnp.where(still_big, q + 2, q)
    r = jnp.where(still_big, r - 2 * fr, r)
    x_new = (q << 16) + r + st
    return jnp.where(active, x_new, x), \
        jnp.where(renorm, chunk, jnp.uint16(0)), renorm


def _rans_decode_step(x, chunk, g_cdf, g_len, g_off, idx, active):
    """One masked rANS decode step; returns (new_x, symbols)."""
    slot = (x & _MASK16).astype(jnp.int32)
    v = _cdf_search(g_cdf, g_len, idx, slot)
    st = g_cdf[idx, v].astype(jnp.uint32)
    fr = jnp.maximum(g_cdf[idx, v + 1].astype(jnp.uint32) - st, 1)
    x_new = fr * (x >> 16) + slot.astype(jnp.uint32) - st
    need = x_new < RANS_L
    x_new = jnp.where(need, (x_new << 16) | chunk.astype(jnp.uint32),
                      x_new)
    return jnp.where(active, x_new, x), v + g_off[idx]


class JointAutoregressiveDeviceMixin:
    """Device-wire encode/decode for `JointAutoregressiveRuntime`.

    encode_device_wire(x)  -> ops dict (device-resident streams + meta)
    decode_device_wire(ops) -> (image, valid)
    """

    def _front_consts(self, h, w):
        key = ('fronts', h, w)
        if key not in self._jit:
            ii, jj, act = _front_arrays(self._wavefronts(h, w), h, w)
            self._jit[key] = (jnp.asarray(ii), jnp.asarray(jj),
                              jnp.asarray(act))
        return self._jit[key]

    def _gauss_dev(self):
        if 'gauss_dev' not in self._jit:
            t = self.g_tables
            self._jit['gauss_dev'] = (
                jnp.asarray(t.quantized_cdf, jnp.int32),
                jnp.asarray(t.cdf_length, jnp.int32),
                jnp.asarray(t.offset, jnp.int32),
                jnp.asarray(self.scale_table, jnp.float32))
        return self._jit['gauss_dev']

    def _z_latent_hw(self, h, w):
        # g_a stride 16 -> y (h/16, w/16); h_a stride 4 on top -> z
        return -(-h // 4), -(-w // 4)

    def encode_device_wire(self, x):
        """Fused mobile-side program: g_a/h_a/h_s convs + wavefront
        quantization + masked lane-rANS for y + cyclic aligned wire for
        z, one dispatch. Returns device-resident ops."""
        from ..ops.rans.device import auto_lanes, device_rans_encode
        x = jnp.asarray(x, jnp.float32)
        # g_a is four ceil(h/2) stride-2 convs -> ceil(h/16) latent (floor
        # division silently CROPPED non-multiple-of-16 inputs); asserted
        # against the traced latent below
        hh = -(-int(x.shape[1]) // 16)
        ww = -(-int(x.shape[2]) // 16)
        ii, jj, act = self._front_consts(hh, ww)
        g_cdf, g_len, g_off, stab = self._gauss_dev()
        zh, zw = self._z_latent_hw(hh, ww)
        z_lanes = auto_lanes(zh * zw * self.module.n,
                             cyclic_channels=self.module.n)
        m = self.module.m
        k2 = 2          # 5x5 context halo

        def enc(variables, x, z_med, g_cdf, g_len, g_off, stab,
                ii, jj, act):
            ar = _DeviceAutoregressive(variables['params'])
            ops = self.module.apply(variables, x, z_med,
                                    method=self.module.encode_ops)
            y = ops['y'][0]
            hyper = ops['hyper'][0]
            zsym = ops['z_symbols']
            # trace-time guard: the wavefront constants must cover the
            # ACTUAL traced latent (a mismatch here would silently code
            # a crop of y)
            assert y.shape[:2] == (hh, ww), (y.shape, hh, ww)
            assert zsym.shape[1:3] == (zh, zw), (zsym.shape, zh, zw)
            T, F = ii.shape
            N = F * m
            pad = [(k2, k2), (k2, k2), (0, 0)]

            # forward wavefront scan: quantize + collect symbols/indexes
            def fwd(y_hat, inp):
                ii_t, jj_t, act_t = inp
                scales, means = ar.front_params(y_hat, hyper, ii_t, jj_t)
                yv = y[jnp.clip(ii_t, 0), jnp.clip(jj_t, 0)]
                sym = jnp.round(yv - means).astype(jnp.int32)
                idx = _scale_indexes(scales, stab)
                # inactive pad slots (ii = -1 -> padded row 1, IN bounds)
                # must not write: they'd deposit program-dependent garbage
                # in the halo that later fronts read as causal taps —
                # route them out of bounds so mode='drop' drops them
                rows = jnp.where(act_t, ii_t + k2, y_hat.shape[0])
                y_hat = y_hat.at[rows, jj_t + k2].set(
                    sym.astype(jnp.float32) + means, mode='drop')
                return y_hat, (sym, idx)

            y_hat0 = jnp.zeros((hh + 2 * k2, ww + 2 * k2, m), jnp.float32)
            y_hat, (syms, idxs) = jax.lax.scan(fwd, y_hat0, (ii, jj, act))

            # masked lane-rANS encode, reverse front order, aligned layout
            v = syms.reshape(T, N) - g_off[idxs.reshape(T, N)]
            lane_act = jnp.repeat(act, m, axis=1)          # (T, N)
            maxv = g_len[idxs.reshape(T, N)] - 2
            ok = jnp.all((~lane_act) | ((v >= 0) & (v < maxv)))
            vc = jnp.clip(v, 0, jnp.maximum(maxv - 1, 0))
            # POINT gathers (T*N elements) — materializing the full
            # (T, N, ~3.2k) row gather costs >100 ms on the TPU gather
            # engine (measured; the reason decode searches by bisection)
            idx_flat = idxs.reshape(T, N)
            st_all = g_cdf[idx_flat, vc].astype(jnp.uint32)
            nxt_all = g_cdf[idx_flat, vc + 1].astype(jnp.uint32)

            def enc_step(x, inp):
                st, nxt, a = inp
                x, chunk, emit = _rans_encode_step(x, st, nxt - st, a)
                return x, (chunk, emit)

            x0 = jnp.full((N,), RANS_L, jnp.uint32)
            x_fin, (chunks, emits) = jax.lax.scan(
                enc_step, x0,
                (jnp.flip(st_all, 0), jnp.flip(nxt_all, 0),
                 jnp.flip(lane_act, 0)))
            streams = jnp.flip(chunks, 0).T                # (N, T) aligned
            lengths = jnp.sum(emits, axis=0).astype(jnp.int32)

            # z wire: cyclic aligned lanes
            z_out = device_rans_encode(
                zsym.reshape(-1),
                jnp.tile(jnp.arange(self.module.n, dtype=jnp.int32),
                         zsym.size // self.module.n),
                self._z_cdf, self._z_len, self._z_off,
                num_lanes=z_lanes, cyclic_channels=self.module.n,
                aligned=True)
            nbytes = (4 + 6 * N + 2 * jnp.sum(lengths)) + z_out['nbytes']
            meta = jnp.stack([(ok & z_out['ok']).astype(jnp.int32),
                              nbytes.astype(jnp.int32)])
            return {'y_streams': streams, 'y_states': x_fin,
                    'y_lengths': lengths, 'z': z_out, 'meta': meta,
                    'y_hat': y_hat[k2:k2 + hh, k2:k2 + ww]}

        out = self._jitted(f'enc_devwire_jahp{hh}x{ww}', enc)(
            self.variables, x, self._medians_dev, g_cdf, g_len, g_off,
            stab, ii, jj, act)
        out['shape'] = (hh, ww)
        return out

    def decode_device_wire(self, ops):
        """Fused server-side program: z decode -> hyper -> wavefront scan
        interleaving the context model with masked lane-rANS decode ->
        g_s. Returns (image, valid)."""
        from ..ops.rans.device import auto_lanes, device_rans_decode
        hh, ww = ops['shape']
        ii, jj, act = self._front_consts(hh, ww)
        g_cdf, g_len, g_off, stab = self._gauss_dev()
        zh, zw = self._z_latent_hw(hh, ww)
        z_lanes = auto_lanes(zh * zw * self.module.n,
                             cyclic_channels=self.module.n)
        m = self.module.m
        k2 = 2

        def dec(variables, y_streams, y_states, z_streams, z_states,
                z_med, g_cdf, g_len, g_off, stab, ii, jj, act):
            ar = _DeviceAutoregressive(variables['params'])
            n = self.module.n
            z_flat, z_valid = device_rans_decode(
                z_streams, z_states,
                jnp.tile(jnp.arange(n, dtype=jnp.int32), zh * zw),
                self._z_cdf, self._z_len, self._z_off,
                n_symbols=zh * zw * n, num_lanes=z_lanes,
                cyclic_channels=n, aligned=True)
            z_sym = z_flat.reshape(1, zh, zw, n)
            hyper = self.module.apply(
                variables, z_sym, z_med,
                method=self.module.hyper_from_z)[0]
            T, F = ii.shape
            N = F * m

            def step(carry, inp):
                y_hat, x = carry
                ii_t, jj_t, act_t, chunk_t = inp
                scales, means = ar.front_params(y_hat, hyper, ii_t, jj_t)
                idx = _scale_indexes(scales, stab).reshape(N)
                lane_act = jnp.repeat(act_t, m)
                x, sym = _rans_decode_step(x, chunk_t, g_cdf, g_len,
                                           g_off, idx, lane_act)
                yv = sym.reshape(F, m).astype(jnp.float32) + means
                rows = jnp.where(act_t, ii_t + k2, y_hat.shape[0])
                y_hat = y_hat.at[rows, jj_t + k2].set(yv, mode='drop')
                return (y_hat, x), None

            y_hat0 = jnp.zeros((hh + 2 * k2, ww + 2 * k2, m), jnp.float32)
            (y_hat, x_end), _ = jax.lax.scan(
                step, (y_hat0, jnp.asarray(y_states, jnp.uint32)),
                (ii, jj, act, y_streams.T))
            valid = z_valid & jnp.all(x_end == RANS_L)
            y_final = y_hat[k2:k2 + hh, k2:k2 + ww]
            img = self.module.apply(variables, y_final[None],
                                    method=self.module.decode_image)
            return img, valid, y_final

        img, valid, y_final = self._jitted(
            f'dec_devwire_jahp{hh}x{ww}', dec)(
            self.variables, ops['y_streams'], ops['y_states'],
            ops['z']['streams'], ops['z']['states'], self._medians_dev,
            g_cdf, g_len, g_off, stab, ii, jj, act)
        self._last_y_hat_dec_device = y_final    # test hook
        return img, valid
