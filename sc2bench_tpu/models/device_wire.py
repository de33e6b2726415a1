"""Shared device-rANS wire plumbing for factorized split runtimes.

The reference entropy-codes on the host in CompressAI's serial C++
(`/root/reference/sc2bench/models/layer.py:506,520`); the device wire
instead fuses the interleaved rANS codec (`ops/rans/device.py`) into the
encode XLA program and decodes from device-resident streams, so the only
per-image host interaction is an 8-byte ``[ok, nbytes]`` meta read for
exact byte accounting.

`FactorizedDeviceWire` carries everything that is identical between the
detection and segmentation runtimes (CDF table upload, latent-shape
probe, fused encode+code program, lane selection, and the pipelined
dispatch/host-stage skeleton with the host-coder fallback); only the
decode tail differs per task and is supplied via ``_wire_decode``. The
classification runtime (`models/runtime.py`) keeps its own superset
implementation: it additionally handles hyperprior (two-stream) wires,
``pull_wire`` packing, and bf16 variable swaps that have no det/seg
counterpart.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class FactorizedDeviceWire:
    """Mixin for ``AnalyzerHolder`` runtimes with a factorized-prior
    bottleneck. Host-class requirements: ``module``, ``variables``,
    ``_medians_dev``, ``codec.tables``, ``_jitted``/``_jit``,
    ``analyze``, and the host-coder fallback pair ``_encode_device`` /
    ``_host_stage``. Subclasses implement
    ``_wire_decode(ops, hw, num_lanes)`` -> final per-image output."""

    def _device_tables(self):
        if getattr(self, '_cdf_dev', None) is None:
            t = self.codec.tables
            self._cdf_dev = (jnp.asarray(t.quantized_cdf),
                             jnp.asarray(t.cdf_length),
                             jnp.asarray(t.offset))
        return self._cdf_dev

    def _latent_shape(self, x_shape):
        key = ('latent_shape', tuple(x_shape))
        if key not in self._jit:
            shp = jax.eval_shape(
                lambda v, x, m: self.module.apply(
                    v, x, m, method=lambda mod, x, med:
                        mod.encode_ops(x, med)),
                self.variables,
                jax.ShapeDtypeStruct(tuple(x_shape), jnp.float32),
                jax.ShapeDtypeStruct(self._medians_dev.shape, jnp.float32))
            self._jit[key] = tuple(shp['symbols'].shape[1:])
        return self._jit[key]

    def _wire_lanes(self, x_shape):
        """Lane count with the channel-cyclic constraint: every lane holds
        ONE fixed latent channel, enabling the gather-free fixed-lane-CDF
        fast path (`ops/rans/device.py:auto_lanes`)."""
        from ..ops.rans.device import auto_lanes
        lat = self._latent_shape(x_shape)
        return auto_lanes(int(np.prod(lat)), cyclic_channels=int(lat[-1]))

    def encode_device_wire(self, x, num_lanes=256):
        """One fused dispatch: bottleneck encode -> quantize -> device
        rANS. Returns the codec dict plus ``meta`` ([ok, nbytes] for the
        8-byte host read) and ``lat_shape``."""
        from ..ops.rans.device import device_rans_encode
        cdf, cdf_len, off = self._device_tables()

        def enc(v, x, m, cdf, cdf_len, off):
            ops = self.module.apply(
                v, x, m, method=lambda mod, x, med:
                    mod.encode_ops(x, med))
            flat = ops['symbols'].reshape(-1)
            c = ops['symbols'].shape[-1]
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32),
                           flat.shape[0] // c)
            # channel-cyclic indexes -> fast path whenever c | num_lanes
            out = device_rans_encode(flat, idx, cdf, cdf_len, off,
                                     num_lanes=num_lanes,
                                     cyclic_channels=c)
            out['meta'] = jnp.stack([out['ok'].astype(jnp.int32),
                                     out['nbytes']])
            return out

        out = self._jitted(f'enc_devwire{num_lanes}_{x.shape[1:3]}', enc)(
            self.variables, x, self._medians_dev, cdf, cdf_len, off)
        out['lat_shape'] = self._latent_shape(x.shape)
        return out

    def stream_device_wire(self, batches, depth: int = 8, workers: int = 4,
                           num_lanes: int | None = None,
                           timings: dict | None = None):
        """Pipelined batch-1 serving on the device wire: per image, one
        fused encode+code dispatch, one fused decode+task-head dispatch,
        and one 8-byte meta read. Out-of-support latents (never produced
        by a trained model) fall back to the host-coder path per image."""
        import time as _time
        from .runtime import copy_async, pipeline_stream
        batches = [jnp.asarray(b) for b in batches]
        if not batches:
            return []
        if num_lanes is None:
            num_lanes = self._wire_lanes(batches[0].shape)

        def dispatch(i):
            x = batches[i]
            ops = self.encode_device_wire(x, num_lanes=num_lanes)
            copy_async(ops['meta'])
            return i, ops, x.shape[1:3]

        def host_stage(arg):
            # Decode is dispatched WITHOUT waiting for the meta read (the
            # decode program consumes device-resident streams), so the
            # steady-state loop issues no blocking host transfer. The
            # 8-byte metas are harvested after the stream drains; the ok=0
            # escape (never produced by a trained model) is redone then.
            i, ops, hw = arg
            t0 = _time.perf_counter()
            out, valid = self._wire_decode(ops, hw, num_lanes)
            copy_async(valid)
            if timings is not None:
                timings['decode_dispatch'] = \
                    timings.get('decode_dispatch', 0.0) \
                    + _time.perf_counter() - t0
            if i % 32 == 31:
                # throttle: one meta wait per 32 images bounds queued
                # device programs without a per-image sync
                np.asarray(ops['meta'])
            return i, ops['meta'], ops['lat_shape'][:2], hw, out, valid

        staged = list(pipeline_stream(len(batches), dispatch, host_stage,
                                      depth, workers))
        t_acct = _time.perf_counter()
        results = []
        for i, meta, lat_hw, hw, out, valid in staged:
            ok, nbytes = (int(v) for v in np.asarray(meta))
            # `valid` certifies every rANS lane returned to its initial
            # state; corrupt streams (or a miscompiled decode kernel)
            # cannot pass it and are redone on the host-coder path
            if not ok or not bool(np.asarray(valid)):
                sym_ops = self._encode_device(batches[i])
                results.append(self._host_stage(sym_ops, hw))
                continue
            # exact wire size without pulling content: pickle size of a
            # bytes object depends only on its length
            self.analyze({'strings': [[bytes(nbytes)]], 'shape': lat_hw})
            results.append(out)
        if timings is not None:
            timings['account_d2h'] = \
                timings.get('account_d2h', 0.0) \
                + _time.perf_counter() - t_acct
        if results:
            jax.block_until_ready(jax.tree.leaves(results[-1]))
        return results

    def _wire_decode(self, ops, hw, num_lanes):
        """-> (per-image output, validity scalar device array)."""
        raise NotImplementedError
