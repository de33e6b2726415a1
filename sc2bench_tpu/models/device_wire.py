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

    def _wire_enc_fn(self, num_lanes, batch_hint=1):
        """Per-image fused body: bottleneck encode -> quantize -> device
        rANS (+ the [ok, nbytes] meta). Shared by the per-image and the
        vmapped (wire_batch) programs; `batch_hint` tells the rANS
        backend autotune the vmap width it will actually run at."""
        from ..ops.rans.device import device_rans_encode

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
                                     cyclic_channels=c,
                                     batch_hint=batch_hint)
            out['meta'] = jnp.stack([out['ok'].astype(jnp.int32),
                                     out['nbytes']])
            return out
        return enc

    def encode_device_wire(self, x, num_lanes=None):
        """One fused dispatch: bottleneck encode -> quantize -> device
        rANS. Returns the codec dict plus ``meta`` ([ok, nbytes] for the
        8-byte host read) and ``lat_shape``. ``num_lanes`` defaults to
        the cyclic-compatible `_wire_lanes` (a fixed count that does not
        divide by C disables the fast paths)."""
        if num_lanes is None:
            num_lanes = self._wire_lanes(tuple(x.shape))
        cdf, cdf_len, off = self._device_tables()
        out = self._jitted(f'enc_devwire{num_lanes}_{x.shape[1:3]}',
                           self._wire_enc_fn(num_lanes))(
            self.variables, x, self._medians_dev, cdf, cdf_len, off)
        out['lat_shape'] = self._latent_shape(x.shape)
        return out

    def encode_device_wire_batch(self, xs_list, num_lanes=None):
        """`encode_device_wire` vmapped over k same-shape canvases: per
        image streams/metas bit-identical to k batch-1 dispatches (the
        per-sample data-size protocol holds), one dispatch + one (k, 2)
        meta read per group."""
        if num_lanes is None:
            num_lanes = self._wire_lanes(tuple(xs_list[0].shape))
        cdf, cdf_len, off = self._device_tables()
        enc1 = self._wire_enc_fn(num_lanes, batch_hint=len(xs_list))

        def enc_many(v, m, cdf, cdf_len, off, xs):
            return jax.vmap(
                enc1, in_axes=(None, 0, None, None, None, None))(
                v, xs, m, cdf, cdf_len, off)

        # one stacked (k, ...) input instead of k separate program
        # arguments (per-argument dispatch overhead grows superlinearly
        # with k on this runtime; see runtime.encode_device_wire_batch)
        k = len(xs_list)
        out = self._jitted(
            f'enc_devwire_b{k}_{num_lanes}_{xs_list[0].shape[1:3]}',
            enc_many)(
            self.variables, self._medians_dev, cdf, cdf_len, off,
            jnp.stack(xs_list))
        out['lat_shape'] = self._latent_shape(tuple(xs_list[0].shape))
        return out

    def stream_device_wire(self, batches, depth: int = 8, workers: int = 4,
                           num_lanes: int | None = None,
                           wire_batch: int | None = None,
                           timings: dict | None = None):
        """Pipelined batch-1 serving on the device wire: per image, one
        fused encode+code dispatch, one fused decode+task-head dispatch,
        and one 8-byte meta read. Out-of-support latents (never produced
        by a trained model) fall back to the host-coder path per image.
        `wire_batch=k` groups consecutive SAME-SHAPE canvases into one
        fused dispatch pair (per-image bitstreams/accounting unchanged;
        the vmapped head vectorizes wider on device)."""
        import time as _time
        from .runtime import add_timing, copy_async, pipeline_stream
        batches = [jnp.asarray(b) for b in batches]
        if not batches:
            return []
        if num_lanes is None:
            num_lanes = self._wire_lanes(batches[0].shape)
        if wire_batch is not None and wire_batch > 1:
            return self._stream_device_wire_batched(
                batches, wire_batch, depth, workers, num_lanes, timings)

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
            add_timing(timings, 'decode_dispatch',
                       _time.perf_counter() - t0)
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
        add_timing(timings, 'account_d2h',
                   _time.perf_counter() - t_acct)
        if results:
            jax.block_until_ready(jax.tree.leaves(results[-1]))
        return results

    def _stream_device_wire_batched(self, batches, k, depth, workers,
                                    num_lanes, timings):
        """Grouped device-wire serving: consecutive same-shape canvases
        share one fused encode+code / decode+head dispatch pair and ONE
        (k, 2) meta read. Per-image bitstreams, byte accounting, and
        outputs are identical to the per-image wire (each image is coded
        independently inside the vmapped program); remainder groups are
        padded by repeating their final image (padded outputs dropped,
        never accounted). Detection canvases are bucketed, so only
        same-shape neighbors can stack — a shape change closes the group."""
        import time as _time
        from .runtime import add_timing, copy_async, pipeline_stream
        n = len(batches)
        groups = []
        i = 0
        while i < n:
            j = i + 1
            while j < n and j - i < k \
                    and batches[j].shape == batches[i].shape:
                j += 1
            groups.append((i, j))
            i = j

        def dispatch(g):
            j0, j1 = groups[g]
            grp = list(batches[j0:j1])
            grp += [grp[-1]] * (k - len(grp))
            ops = self.encode_device_wire_batch(grp, num_lanes=num_lanes)
            copy_async(ops['meta'])
            return g, ops, batches[j0].shape[1:3]

        def host_stage(arg):
            g, ops, hw = arg
            t0 = _time.perf_counter()
            out, valid = self._wire_decode_batch(ops, hw, num_lanes)
            copy_async(valid)
            add_timing(timings, 'decode_dispatch',
                       _time.perf_counter() - t0)
            if g % 8 == 7:
                # throttle: one meta wait per 8 groups bounds queued
                # device programs without a per-group sync
                np.asarray(ops['meta'])
            return g, ops['meta'], ops['lat_shape'][:2], hw, out, valid

        staged = list(pipeline_stream(len(groups), dispatch, host_stage,
                                      depth, workers))
        t_acct = _time.perf_counter()
        results = []
        for g, meta, lat_hw, hw, out, valid in staged:
            j0, j1 = groups[g]
            meta_np = np.asarray(meta)
            valid_np = np.asarray(valid)
            for j in range(j1 - j0):
                ok, nbytes = int(meta_np[j, 0]), int(meta_np[j, 1])
                if not ok or not bool(valid_np[j]):
                    # escape-coded latent or failed decode: host path
                    sym_ops = self._encode_device(batches[j0 + j])
                    results.append(self._host_stage(sym_ops, hw))
                    continue
                self.analyze({'strings': [[bytes(nbytes)]],
                              'shape': lat_hw})
                results.append(jax.tree.map(lambda a: a[j], out))
        add_timing(timings, 'account_d2h',
                   _time.perf_counter() - t_acct)
        if results:
            jax.block_until_ready(jax.tree.leaves(results[-1]))
        return results

    def _wire_dec_fn(self, lat_shape, hw, num_lanes, batch_hint=1):
        """Subclass hook: the per-image pure decode body
        (variables, streams, states, medians, cdf, cdf_len, off) ->
        (task output, validity scalar). `batch_hint` is the vmap width
        the body will run at (rANS backend autotune)."""
        raise NotImplementedError

    def _wire_decode(self, ops, hw, num_lanes):
        """-> (per-image output, validity scalar device array)."""
        cdf, cdf_len, off = self._device_tables()
        return self._jitted(
            f'dec_devwire{hw[0]}x{hw[1]}_l{num_lanes}',
            self._wire_dec_fn(ops['lat_shape'], hw, num_lanes))(
            self.variables, ops['streams'], ops['states'],
            self._medians_dev, cdf, cdf_len, off)

    def _wire_decode_batch(self, ops, hw, num_lanes):
        """-> (stacked outputs, (k,) validity) via vmap of the per-image
        decode body."""
        cdf, cdf_len, off = self._device_tables()
        k = int(ops['streams'].shape[0])
        dec1 = self._wire_dec_fn(ops['lat_shape'], hw, num_lanes,
                                 batch_hint=k)
        return self._jitted(
            f'dec_devwire_b{k}_{hw[0]}x{hw[1]}_l{num_lanes}',
            jax.vmap(dec1, in_axes=(None, 0, 0, None, None, None, None)))(
            self.variables, ops['streams'], ops['states'],
            self._medians_dev, cdf, cdf_len, off)
