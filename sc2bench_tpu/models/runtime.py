"""Stateful model runtimes: the deploy-path orchestration layer.

The reference keeps train/deploy mode as mutable module state
(`bottleneck_updated`, `sc2bench/models/backbone.py:225-258`). Here a
runtime object owns: the Flax module, its variables, the coding tables
(built by the functional `update()`), the host rANS coders, and the
analyzers — and exposes the reference's API surface (`update()`,
`activate_analysis()`, `__call__`) over separately-jitted pure programs:

    encode_fn   (mobile side)  x -> integer symbols          [jit #1]
    rANS        (host, C++)    symbols -> bytes -> symbols
    decode_fn   (server side)  symbols -> feature -> logits  [jit #2]

This split-at-the-compilation-boundary is the TPU-native realization of
split computing (SURVEY.md §7 design stance).
"""
from __future__ import annotations

import threading

import numpy as np
import jax
import jax.numpy as jnp

from ..analysis import AnalyzerHolder
from ..ops.entropy.tables import (
    CodingTables, build_factorized_tables, build_gaussian_tables)
from ..ops.rans.coder import RansCoder
from .layer import (EntropyBottleneckLayer, FPBasedResNetBottleneck,
                    SHPBasedResNetBottleneck)


def _channel_major(symbols: np.ndarray) -> np.ndarray:
    """(h, w, c) -> channel-major flat order (c, h*w) for per-channel CDFs."""
    return np.transpose(symbols, (2, 0, 1)).reshape(symbols.shape[-1], -1)


_TIMINGS_LOCK = threading.Lock()


def add_timing(timings, key, dt):
    """Thread-safe accumulation into a caller-owned timings dict: host
    stages run on a worker pool, and a bare read-modify-write drops
    updates under contention."""
    if timings is None:
        return
    with _TIMINGS_LOCK:
        timings[key] = timings.get(key, 0.0) + dt


def copy_async(tree):
    """Best-effort start of device->host copies for every array leaf
    (overlapped with later dispatches; consumers still synchronize via
    `np.asarray` at harvest). Non-copyable leaves are skipped."""
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except Exception:
            pass


def pipeline_stream(n: int, dispatch, host_stage, depth: int = 8,
                    workers: int = 4):
    """Shared software-pipelining driver for the deploy runtimes: yields
    `host_stage(dispatch(i))` results in order, keeping at most `depth`
    items in flight (device dispatch happens on the caller's thread; host
    stages run on a small pool whose waits release the GIL). The bound is
    real: item i+depth is not dispatched until item i's result has been
    consumed, so device memory holds <= depth encode outputs regardless of
    stream length."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    if n <= 0:
        return
    with ThreadPoolExecutor(workers) as ex:
        futures = deque()
        for i in range(n):
            if len(futures) >= depth:
                yield futures.popleft().result()
            futures.append(ex.submit(host_stage, dispatch(i)))
        while futures:
            yield futures.popleft().result()


def to_wire(ops):
    """Narrow int32 symbol/index tensors to int16 for the device->host hop
    (jit-safe tree map). Lossless for any realistic latent (|round(y -
    median)| << 32767; the reference ships the same values as int32 over
    PCIe, `layer.py:506`): halves the transfer, which is the deploy-loop
    bottleneck over a remote-TPU tunnel. Shared by the classifier runtime
    and the detection/segmentation deploy wrappers."""
    return jax.tree.map(
        lambda a: a.astype(jnp.int16) if a.dtype == jnp.int32 else a, ops)


def _stack_group(xs_list):
    """Stack a wire_batch group. For HOST numpy frames (a real serving
    frontend), np.stack + ONE upload; for device-resident arrays, an
    on-device jnp.stack — a 128-operand concatenate whose host-side
    marshaling costs ~86 ms/group on a tunneled runtime (measured,
    script/probe_e2e_budget.py) and is the e2e throughput-mode floor
    there. A local PCIe host pays ~1 ms for either."""
    if all(isinstance(x, np.ndarray) for x in xs_list):
        return jnp.asarray(np.stack(xs_list))
    return jnp.stack(xs_list)


def _narrow(symbols: np.ndarray) -> np.ndarray:
    """Narrow a host symbol array to the smallest lossless integer dtype for
    the host->device hop (int8 when the range allows, else int16 — trained
    latents fit int8 almost always; the range check keeps it exact)."""
    if symbols.dtype == np.int8:
        return symbols
    lo, hi = symbols.min(), symbols.max()
    if -128 <= lo and hi <= 127:
        return symbols.astype(np.int8)
    return symbols.astype(np.int16)


class FactorizedCodec:
    """Bitstream codec for an `EntropyBottleneck`-only bottleneck (FP)."""

    def __init__(self, bottleneck_path='bottleneck_layer'):
        self.bottleneck_path = bottleneck_path
        self.tables: CodingTables | None = None
        self.coder: RansCoder | None = None

    def eb_params(self, variables):
        params = variables['params']
        if self.bottleneck_path:
            for part in self.bottleneck_path.split('.'):
                params = params[part]
        return params['entropy_bottleneck']

    def update(self, module, variables, eb_module):
        self.tables = build_factorized_tables(eb_module,
                                              {'params': self.eb_params(variables)})
        self.coder = RansCoder(self.tables.quantized_cdf,
                               self.tables.cdf_length, self.tables.offset)

    def compress_symbols(self, symbols: np.ndarray):
        """symbols: (n, h, w, c) int32 -> list of per-sample byte strings."""
        n, h, w, c = symbols.shape
        indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
        return [self.coder.encode_with_indexes(
            _channel_major(symbols[i]).ravel(), indexes) for i in range(n)]

    def decompress_symbols(self, strings, shape, channels):
        h, w = shape
        indexes = np.repeat(np.arange(channels, dtype=np.int32), h * w)
        out = []
        for s in strings:
            flat = self.coder.decode_with_indexes(s, indexes)
            out.append(np.transpose(flat.reshape(channels, h, w), (1, 2, 0)))
        return np.stack(out)

    # ---- wire fast path: channels-last int16, no host transpose/widening --
    def compress_wire(self, symbols: np.ndarray):
        """symbols: (n, h, w, c) int16 (the device wire layout) -> per-sample
        byte strings. Same bitstream format and statistically identical size
        as `compress_symbols` (identical symbols and CDFs; only the symbol
        order inside the stream differs), but the host does zero reordering:
        the NHWC ravel is contiguous and the channel index is implicit."""
        n, h, w, c = symbols.shape
        flat = symbols.reshape(n, -1)
        return [self.coder.encode_cyclic_i16(flat[i], c) for i in range(n)]

    def decompress_wire(self, strings, shape, channels):
        h, w = shape
        return np.stack([
            self.coder.decode_cyclic_i16(s, h * w * channels,
                                         channels).reshape(h, w, channels)
            for s in strings])


class HyperpriorCodec(FactorizedCodec):
    """Codec for SHP/MSHP: factorized-coded z + gaussian-coded y."""

    def __init__(self, bottleneck_path='bottleneck_layer'):
        super().__init__(bottleneck_path)
        self.g_tables: CodingTables | None = None
        self.g_coder: RansCoder | None = None

    def update(self, module, variables, eb_module, scale_table=None):
        super().update(module, variables, eb_module)
        self.g_tables = build_gaussian_tables(scale_table)
        self.g_coder = RansCoder(self.g_tables.quantized_cdf,
                                 self.g_tables.cdf_length,
                                 self.g_tables.offset)

    def compress_y(self, y_symbols: np.ndarray, y_indexes: np.ndarray):
        n = y_symbols.shape[0]
        return [self.g_coder.encode_with_indexes(
            y_symbols[i].ravel(), y_indexes[i].ravel()) for i in range(n)]

    def decompress_y(self, strings, y_indexes: np.ndarray):
        out = []
        for i, s in enumerate(strings):
            flat = self.g_coder.decode_with_indexes(s, y_indexes[i].ravel())
            out.append(flat.reshape(y_indexes[i].shape))
        return np.stack(out)

    # ---- wire fast path: both tensors stay int16 -------------------------
    def compress_y_wire(self, y_symbols: np.ndarray, y_indexes: np.ndarray):
        n = y_symbols.shape[0]
        return [self.g_coder.encode_with_indexes_i16(y_symbols[i],
                                                     y_indexes[i])
                for i in range(n)]

    def decompress_y_wire(self, strings, y_indexes: np.ndarray):
        return np.stack([
            self.g_coder.decode_with_indexes_i16(
                s, y_indexes[i]).reshape(y_indexes[i].shape)
            for i, s in enumerate(strings)])


class SplitClassifierRuntime(AnalyzerHolder):
    """Runtime for `SplittableResNet`-style models with an FP/SHP/MSHP or
    Simple bottleneck. Mirrors the reference's updatable-backbone contract
    (`backbone.py:47-76`): `update()`, `get_aux_module()`,
    `bottleneck_updated`, plus the analyzable surface."""

    def __init__(self, module, variables, analyzer_configs=None,
                 analysis_unit='KB', deploy_bf16_tail=False,
                 deploy_bf16_decode=False, deploy_bf16_encode=False,
                 input_norm=None):
        if analyzer_configs is None:
            analyzer_configs = [{'key': 'FileSizeAnalyzer',
                                 'kwargs': {'unit': analysis_unit}}]
        super().__init__(analyzer_configs)
        self.module = module
        self.variables = variables
        self.bottleneck_updated = False
        self.training = False
        # Optional device-side input normalization: when set to
        # (mean, std) (per-channel, in 0-1 scale), uint8 images may be fed
        # directly to the deploy paths — they cross the host->device
        # boundary at 1/4 the bytes and are converted to
        # (x/255 - mean)/std on device. TPU-first placement of the
        # reference's host-side ToTensor+Normalize (SURVEY §5.6 pipelines).
        if input_norm is not None:
            mean, std = input_norm
            self._norm_mean = jnp.asarray(mean, jnp.float32)
            self._norm_std = jnp.asarray(std, jnp.float32)
        else:
            self._norm_mean = None
        # Optional mixed-precision serving: run the server-side tail
        # (layer2..4 + head) in bfloat16 while the bottleneck decode
        # (dequantize + IGDN deconvs) stays float32 so reconstruction
        # matches training exactly. ~1.5x decode-program speedup on v5e;
        # logits differ only by bf16 rounding in the tail.
        self.deploy_bf16_tail = deploy_bf16_tail
        # Mixed-precision DEVICE-WIRE serving: the decode-side programs
        # (entropy decode -> bottleneck decoder -> tail) apply a bfloat16
        # CLONE of the module with the ORIGINAL f32 variables — decoder/
        # tail convs compute on the MXU in bf16 (params cast at compute
        # time), while everything that must stay bit-exact does:
        #   * the ENCODE program is untouched (same f32 program), so
        #     per-image bitstreams and byte accounting are byte-identical
        #     (the reference's compress contract, layer.py:496-521);
        #   * entropy decode is integer;
        #   * the hyperprior's h_a/h_s convs carry no compute-dtype
        #     attribute, so the clone leaves their f32 kernels alone and
        #     decode-side gaussian indexes match the encoder's exactly.
        # Logits differ from the f32 wire only by bf16 rounding
        # (asserted in tests/test_device_rans.py).
        self.deploy_bf16_decode = deploy_bf16_decode
        # OPT-IN mixed-precision ENCODE for the device-wire programs: the
        # encoder convs of the same bf16 clone feed the (always-f32)
        # symbol rounding and entropy coder. Unlike deploy_bf16_decode
        # this CHANGES the bitstream slightly (~0.3% of latent symbols
        # move by +-1 where the bf16 latent crosses a rounding boundary;
        # wire size within ~1e-4, measured script/probe_bf16_encode.py)
        # — the stream is equally valid and self-consistent (the decoder
        # consumes the transmitted symbols), but it is NOT byte-identical
        # to the reference-semantics f32 encoder, so the data-size
        # protocol's byte-identity tests keep this off. Encode program
        # measured 1.5x at wire_batch=128 on v5e.
        self.deploy_bf16_encode = deploy_bf16_encode
        self._module_bf16 = None
        # Module-level deploy ops (EntropicClassifierModule) vs. a
        # bottleneck_layer submodule (SplittableResNet family).
        self._module_level_ops = hasattr(module, 'encode_ops') and not \
            hasattr(module, 'bottleneck_layer')
        if self._module_level_ops:
            self._bneck = None
            self.codec = FactorizedCodec(bottleneck_path='')
        else:
            self._bneck = module.bottleneck_layer
            if isinstance(self._bneck, SHPBasedResNetBottleneck):
                self.codec = HyperpriorCodec()
            elif isinstance(self._bneck, (FPBasedResNetBottleneck,
                                          EntropyBottleneckLayer)):
                self.codec = FactorizedCodec()
            else:
                self.codec = None
        self._jit_cache = {}
        import threading
        self._jit_lock = threading.Lock()

    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, value):
        # invalidate the cached bf16 tail copy whenever weights change
        # (checkpoint reload, engine reassignment) — a stale cast would
        # silently mix two checkpoints in one forward
        self._variables = value
        self._bf16_variables = None

    # ---- reference API surface -----------------------------------------
    def update(self, scale_table=None):
        """Build coding tables from learned params (reference
        `backbone.py:256-258` → `layer.py:388-398`). The EntropyBottleneck
        module definition is reconstructed from the stored quantiles shape
        (submodules built in setup() are not reachable on unbound modules)."""
        if self.codec is None:
            return False
        from ..ops.entropy.factorized import EntropyBottleneck
        eb_channels = int(self.codec.eb_params(self.variables)
                          ['quantiles'].shape[0])
        eb = EntropyBottleneck(channels=eb_channels)
        if isinstance(self.codec, HyperpriorCodec):
            self.codec.update(self.module, self.variables, eb, scale_table)
            self._scale_table_dev = jnp.asarray(
                self.codec.g_tables.scale_table)
        else:
            self.codec.update(self.module, self.variables, eb)
        # cache device-resident table constants: re-uploading per call costs
        # a host->device round trip each (pathological over a TPU tunnel)
        self._medians_dev = jnp.asarray(self.codec.tables.medians)
        self._cdf_dev = None   # device-wire table caches (rebuilt lazily)
        self._gcdf_dev = None
        self.bottleneck_updated = True
        return True

    def get_aux_module(self):
        return self._bneck

    def train(self, mode=True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    # ---- jitted pure programs ------------------------------------------
    def _jitted(self, name, fn):
        # double-checked lock: stream worker threads can race the first
        # compile of a program and pay it `workers` times over
        if name not in self._jit_cache:
            with self._jit_lock:
                if name not in self._jit_cache:
                    self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def _prep_input(self, x):
        """Device-side uint8 -> normalized float (traced into the encode
        program when `input_norm` is configured); float inputs pass
        through untouched. uint8 without `input_norm` is rejected: type
        promotion would silently feed raw 0-255 values to the network."""
        if x.dtype == jnp.uint8:
            if self._norm_mean is None:
                raise ValueError(
                    'uint8 input requires input_norm=(mean, std) on the '
                    'runtime — without it raw 0-255 values would reach the '
                    'network (silent accuracy collapse). Configure '
                    "input_norm or convert to normalized float32 host-side.")
            x = x.astype(jnp.float32) / 255.0
            x = (x - self._norm_mean) / self._norm_std
        return x

    def _forward_train_mode(self, x, mode, rng):
        def fn(variables, x, rng):
            return self.module.apply(
                variables, x, mode=mode, train=False,
                rngs={'noise': rng} if mode == 'train' else None)
        return self._jitted(f'fwd_{mode}', fn)(self.variables, x, rng)

    def encode(self, x):
        """Mobile-side program + host entropy coding. Returns the
        compressed object dict (reference shape: {'strings', 'shape'})."""
        if isinstance(self.codec, HyperpriorCodec):
            def enc(variables, x, z_medians, scale_table):
                return self.module.apply(
                    variables, self._prep_input(x), z_medians, scale_table,
                    method=lambda m, x, zm, st:
                        m.bottleneck_layer.encode_ops(x, zm, st))
            ops = self._jitted('encode', enc)(
                self.variables, x, self._medians_dev, self._scale_table_dev)
            y_sym = np.asarray(ops['y_symbols'])
            y_idx = np.asarray(ops['y_indexes'])
            z_sym = np.asarray(ops['z_symbols'])
            y_strings = self.codec.compress_y(y_sym, y_idx)
            z_strings = self.codec.compress_symbols(z_sym)
            return {'strings': [y_strings, z_strings],
                    'shape': tuple(z_sym.shape[1:3])}
        else:
            if self._module_level_ops:
                def enc(variables, x, medians):
                    return self.module.apply(
                        variables, self._prep_input(x), medians,
                        method=lambda m, x, med: m.encode_ops(x, med))
            else:
                def enc(variables, x, medians):
                    return self.module.apply(
                        variables, self._prep_input(x), medians,
                        method=lambda m, x, med:
                            m.bottleneck_layer.encode_ops(x, med))
            ops = self._jitted('encode', enc)(
                self.variables, x, self._medians_dev)
            symbols = np.asarray(ops['symbols'])
            strings = self.codec.compress_symbols(symbols)
            return {'strings': [strings], 'shape': tuple(symbols.shape[1:3])}

    def decode(self, strings, shape):
        """Host entropy decoding + server-side program to logits."""
        if isinstance(self.codec, HyperpriorCodec):
            z_channels = self._bneck.num_latent_channels
            z_sym = self.codec.decompress_symbols(strings[1], shape,
                                                  z_channels)
            y_idx, _ = self._jitted('dec_scales', self._scales_fn())(
                self.variables, jnp.asarray(_narrow(z_sym)),
                self._medians_dev, self._scale_table_dev)
            y_sym = self.codec.decompress_y(strings[0], np.asarray(y_idx))
            # int16 on the wire (host->device), cast in decode_ops
            return self._jitted('decode', self._decode_fn_hyper())(
                self.variables, jnp.asarray(_narrow(y_sym)),
                jnp.asarray(_narrow(z_sym)), self._medians_dev)
        else:
            channels = self.codec.tables.medians.shape[0]
            symbols = self.codec.decompress_symbols(strings[0], shape,
                                                    channels)
            return self._decode_call(jnp.asarray(_narrow(symbols)))

    def _scales_fn(self):
        def scales_fn(variables, z_symbols, z_medians, scale_table):
            return self.module.apply(
                variables, z_symbols, z_medians, scale_table,
                method=lambda m, zs, zm, st:
                    m.bottleneck_layer.decode_scales(zs, zm, st))
        return scales_fn

    def _decode_fn_hyper(self):
        def dec(variables, y_symbols, z_symbols, z_medians):
            def m_fn(m, ys, zs, zm):
                feat = m.bottleneck_layer.decode_ops(ys, zs, zm)
                return m.forward_tail(feat)
            return self.module.apply(variables, y_symbols, z_symbols,
                                     z_medians, method=m_fn)
        return dec

    def _decode_hyper_wire(self, strings, shape):
        """Hyperprior decode from the wire formats (stream_deploy fast
        path): z from the cyclic int16 stream, y-indexes recomputed on
        device and shipped back as int16, y from the int16-indexed stream —
        every host tensor stays in the wire dtype."""
        z_channels = self._bneck.num_latent_channels
        z_sym = self.codec.decompress_wire(strings[1], shape, z_channels)

        def scales_wire(variables, z_symbols, z_medians, scale_table):
            return to_wire(self._scales_fn()(
                variables, z_symbols, z_medians, scale_table))
        y_idx, _ = self._jitted('dec_scales_wire', scales_wire)(
            self.variables, jnp.asarray(z_sym), self._medians_dev,
            self._scale_table_dev)
        y_sym = self.codec.decompress_y_wire(strings[0], np.asarray(y_idx))
        return self._jitted('decode', self._decode_fn_hyper())(
            self.variables, jnp.asarray(y_sym), jnp.asarray(z_sym),
            self._medians_dev)

    def _decode_fn(self):
        """Server-side jitted program body: symbols -> feature -> logits."""
        if self._module_level_ops:
            def dec(variables, symbols, medians):
                return self.module.apply(
                    variables, symbols, medians,
                    method=lambda m, s, med:
                        m.decode_ops_to_logits(s, med))
        else:
            def dec(variables, symbols, medians):
                def m_fn(m, s, med):
                    feat = m.bottleneck_layer.decode_ops(s, med)
                    return m.forward_tail(feat)
                return self.module.apply(variables, symbols, medians,
                                         method=m_fn)
        return dec

    def _decode_call(self, symbols_dev):
        """Dispatch the server-side program; optionally with a bf16 tail."""
        if self.deploy_bf16_tail and not self._module_level_ops:
            if self._bf16_variables is None:
                self._bf16_variables = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, self.variables)

            def dec(variables, bf16_vars, symbols, medians):
                feat = self.module.apply(
                    variables, symbols, medians,
                    method=lambda m, s, med:
                        m.bottleneck_layer.decode_ops(s, med))
                logits = self.module.apply(
                    bf16_vars, feat.astype(jnp.bfloat16),
                    method=lambda m, f: m.forward_tail(f))
                return logits.astype(jnp.float32)
            return self._jitted('decode_bf16', dec)(
                self.variables, self._bf16_variables, symbols_dev,
                self._medians_dev)
        return self._jitted('decode', self._decode_fn())(
            self.variables, symbols_dev, self._medians_dev)

    def _decode_wire(self, strings, shape):
        """Decode from the cyclic int16 wire format (stream_deploy fast
        path): the rANS output is already the (h, w, c) int16 device layout,
        so no transpose, range scan, or widening precedes the h2d hop."""
        channels = self.codec.tables.medians.shape[0]
        symbols = self.codec.decompress_wire(strings, shape, channels)
        return self._decode_call(jnp.asarray(symbols))

    # ---- device-rANS wire mode (entropy coding ON the TPU) --------------
    def _bf16_clone(self):
        """Lazily-built bfloat16 clone of the module over the ORIGINAL
        f32 variables (params cast at compute time). Shared by the
        decode-side (deploy_bf16_decode) and encode-side
        (deploy_bf16_encode) device-wire programs."""
        if self._module_bf16 is None:
            updates = {}
            if hasattr(self.module, 'dtype'):
                updates['dtype'] = jnp.bfloat16
            if self._bneck is not None and hasattr(self._bneck, 'dtype'):
                updates['bottleneck_layer'] = self._bneck.clone(
                    dtype=jnp.bfloat16)
            self._module_bf16 = self.module.clone(**updates)
        return self._module_bf16

    def _decode_module(self):
        """Module used by the device-wire DECODE programs: the plain
        module, or its bfloat16 clone under `deploy_bf16_decode` (see
        __init__ — encode/bitstreams stay byte-identical either way)."""
        return self._bf16_clone() if self.deploy_bf16_decode \
            else self.module

    def _encode_module(self):
        """Module used by the device-wire ENCODE programs: the plain f32
        module (byte-identical bitstreams, the default), or the bfloat16
        clone under opt-in `deploy_bf16_encode` (see __init__ — symbol
        rounding and entropy math stay f32; the encoder convs run at
        MXU bf16 rate)."""
        return self._bf16_clone() if self.deploy_bf16_encode \
            else self.module

    @property
    def _dec_tag(self):
        return '_bf16' if self.deploy_bf16_decode else ''

    @property
    def _enc_tag(self):
        return '_ebf16' if self.deploy_bf16_encode else ''

    def _device_tables(self):
        if getattr(self, '_cdf_dev', None) is None:
            t = self.codec.tables
            self._cdf_dev = jnp.asarray(t.quantized_cdf)
            self._cdf_len_dev = jnp.asarray(t.cdf_length)
            self._offset_dev = jnp.asarray(t.offset)
        return self._cdf_dev, self._cdf_len_dev, self._offset_dev

    def _device_gaussian_tables(self):
        if getattr(self, '_gcdf_dev', None) is None:
            t = self.codec.g_tables
            self._gcdf_dev = (jnp.asarray(t.quantized_cdf),
                              jnp.asarray(t.cdf_length),
                              jnp.asarray(t.offset))
        return self._gcdf_dev

    def _hyper_latent_shapes(self, x_shape):
        """((hy, wy, cy), (hz, wz, cz)) via eval_shape (host ints)."""
        key = ('hyper_latent_shapes', tuple(x_shape))
        if key not in self._jit_cache:
            shp = jax.eval_shape(
                lambda v, x, zm, st: self.module.apply(
                    v, x, zm, st, method=lambda m, x, zm, st:
                        m.bottleneck_layer.encode_ops(x, zm, st)),
                self.variables,
                jax.ShapeDtypeStruct(tuple(x_shape), jnp.float32),
                jax.ShapeDtypeStruct(self._medians_dev.shape, jnp.float32),
                jax.ShapeDtypeStruct(self._scale_table_dev.shape,
                                     jnp.float32))
            self._jit_cache[key] = (tuple(shp['y_symbols'].shape[1:]),
                                    tuple(shp['z_symbols'].shape[1:]))
        return self._jit_cache[key]

    def _hyper_enc_fn(self, num_lanes, z_lanes, batch_hint=1,
                      aligned=False):
        """Per-image SHP/MSHP mobile-side body: bottleneck encode + BOTH
        entropy coders fused (z factorized/cyclic, y gaussian with
        device-computed scale indexes). Shared by the per-image and the
        vmapped (wire_batch) programs. `aligned` selects the time-aligned
        stream layout (batched fused serving; see ops/rans/device.py) —
        wire bytes/accounting identical, compaction-free kernels."""
        from ..ops.rans.device import device_rans_encode
        module = self._encode_module()

        def enc(variables, x, z_med, st, cdf, cdf_len, off,
                g_cdf, g_len, g_off):
            ops = module.apply(
                variables, self._prep_input(x), z_med, st,
                method=lambda m, x, zm, stt:
                    m.bottleneck_layer.encode_ops(x, zm, stt))
            z = ops['z_symbols']
            cz = z.shape[-1]
            z_idx = jnp.tile(jnp.arange(cz, dtype=jnp.int32),
                             z.size // cz)
            z_out = device_rans_encode(z.reshape(-1), z_idx, cdf,
                                       cdf_len, off, num_lanes=z_lanes,
                                       cyclic_channels=cz,
                                       batch_hint=batch_hint,
                                       aligned=aligned)
            y_out = device_rans_encode(
                ops['y_symbols'].reshape(-1),
                ops['y_indexes'].reshape(-1).astype(jnp.int32),
                g_cdf, g_len, g_off, num_lanes=num_lanes,
                aligned=aligned)
            meta = jnp.stack([
                (z_out['ok'] & y_out['ok']).astype(jnp.int32),
                z_out['nbytes'] + y_out['nbytes']])
            return {'z': z_out, 'y': y_out, 'meta': meta}
        return enc

    def _hyper_dec_fn(self, shapes, num_lanes, z_lanes, batch_hint=1,
                      aligned=False):
        """Per-image SHP/MSHP server-side body: decode z -> recompute
        gaussian indexes from z_hat (same deterministic ops as the
        encoder) -> decode y -> decoder + tail."""
        from ..ops.rans.device import device_rans_decode
        (hy, wy, cy), (hz, wz, cz) = shapes
        # The clone's dtype only reaches g_a/g_s (+GDNs) and the tail —
        # h_a/h_s kernels stay f32, so decode_scales' gaussian indexes
        # are bit-identical to the (always-f32) encoder's.
        module = self._decode_module()

        def dec(variables, z_streams, z_states, y_streams, y_states,
                z_med, st, cdf, cdf_len, off, g_cdf, g_len, g_off):
            z_idx = jnp.tile(jnp.arange(cz, dtype=jnp.int32), hz * wz)
            z_flat, z_valid = device_rans_decode(
                z_streams, z_states, z_idx, cdf, cdf_len, off,
                n_symbols=hz * wz * cz, num_lanes=z_lanes,
                cyclic_channels=cz, batch_hint=batch_hint,
                aligned=aligned)
            z_sym = z_flat.reshape(1, hz, wz, cz)
            y_idx, _means = module.apply(
                variables, z_sym, z_med, st,
                method=lambda m, zs, zm, stt:
                    m.bottleneck_layer.decode_scales(zs, zm, stt))
            y_flat, y_valid = device_rans_decode(
                y_streams, y_states, y_idx.reshape(-1).astype(jnp.int32),
                g_cdf, g_len, g_off, n_symbols=hy * wy * cy,
                num_lanes=num_lanes, aligned=aligned)
            y_sym = y_flat.reshape(1, hy, wy, cy)

            def m_fn(m, ys, zs, zm):
                feat = m.bottleneck_layer.decode_ops(ys, zs, zm)
                return m.forward_tail(feat)
            logits = module.apply(variables, y_sym, z_sym, z_med,
                                  method=m_fn)
            return logits.astype(jnp.float32), z_valid & y_valid
        return dec

    def _auto_hyper_lanes(self, x_shape):
        """(y_lanes, z_lanes) for a hyperprior wire. y uses per-element
        gaussian indexes (general path — plain power-of-two lanes); z is
        factorized with channel-cyclic indexes, so its lane count MUST be
        a multiple of cz or the cyclic fast path + Pallas kernels
        silently disable (see _auto_wire_lanes)."""
        return self._auto_hyper_lanes_from_shapes(
            self._hyper_latent_shapes(tuple(x_shape)))

    def encode_device_wire_hyper(self, x, num_lanes=None, z_lanes=None):
        """SHP/MSHP mobile-side program with BOTH entropy coders fused:
        z (factorized tables, cyclic channel indexes) and y (gaussian
        tables, per-element scale indexes computed on device)."""
        if num_lanes is None or z_lanes is None:
            auto_y, auto_z = self._auto_hyper_lanes(x.shape)
            num_lanes = auto_y if num_lanes is None else num_lanes
            z_lanes = auto_z if z_lanes is None else z_lanes
        cdf, cdf_len, off = self._device_tables()
        g_cdf, g_len, g_off = self._device_gaussian_tables()
        out = self._jitted(
            f'enc_devwire_hyper{num_lanes}_{z_lanes}{self._enc_tag}',
            self._hyper_enc_fn(num_lanes, z_lanes))(
            self.variables, x, self._medians_dev, self._scale_table_dev,
            cdf, cdf_len, off, g_cdf, g_len, g_off)
        out['shapes'] = self._hyper_latent_shapes(x.shape)
        return out

    def encode_device_wire_hyper_batch(self, xs_list, num_lanes=None,
                                       z_lanes=None):
        """`encode_device_wire_hyper` vmapped over k images — per-image
        z/y streams and [ok, nbytes] metas are bit-identical to k
        batch-1 dispatches (the per-sample data-size protocol holds),
        sharing ONE dispatch and ONE (k, 2) meta read."""
        if num_lanes is None or z_lanes is None:
            auto_y, auto_z = self._auto_hyper_lanes(tuple(xs_list[0].shape))
            num_lanes = auto_y if num_lanes is None else num_lanes
            z_lanes = auto_z if z_lanes is None else z_lanes
        cdf, cdf_len, off = self._device_tables()
        g_cdf, g_len, g_off = self._device_gaussian_tables()
        enc1 = self._hyper_enc_fn(num_lanes, z_lanes,
                                  batch_hint=len(xs_list), aligned=True)

        def enc_many(variables, z_med, st, cdf, cdf_len, off,
                     g_cdf, g_len, g_off, xs):
            return jax.vmap(enc1, in_axes=(None, 0) + (None,) * 8)(
                variables, xs, z_med, st, cdf, cdf_len, off,
                g_cdf, g_len, g_off)

        # one stacked (k, ...) input, not k program arguments — see
        # encode_device_wire_batch
        k = len(xs_list)
        out = self._jitted(
            f'enc_devwire_hyper_b{k}_{num_lanes}_{z_lanes}a{self._enc_tag}',
            enc_many)(
            self.variables, self._medians_dev, self._scale_table_dev,
            cdf, cdf_len, off, g_cdf, g_len, g_off, _stack_group(xs_list))
        out['shapes'] = self._hyper_latent_shapes(tuple(xs_list[0].shape))
        return out

    def _auto_hyper_lanes_from_shapes(self, shapes):
        from ..ops.rans.device import auto_lanes
        (hy, wy, cy), (hz, wz, cz) = shapes
        return (auto_lanes(hy * wy * cy),
                auto_lanes(hz * wz * cz, cyclic_channels=cz))

    def decode_device_streams_hyper(self, ops, num_lanes=None,
                                    z_lanes=None):
        """Server-side program: decode z (factorized) -> recompute the
        gaussian indexes from z_hat (same deterministic ops as the
        encoder) -> decode y (gaussian) -> decoder + tail, one dispatch
        from the device-resident streams."""
        if num_lanes is None or z_lanes is None:
            auto_y, auto_z = self._auto_hyper_lanes_from_shapes(
                ops['shapes'])
            num_lanes = auto_y if num_lanes is None else num_lanes
            z_lanes = auto_z if z_lanes is None else z_lanes
        cdf, cdf_len, off = self._device_tables()
        g_cdf, g_len, g_off = self._device_gaussian_tables()
        (hy, wy, cy), _ = ops['shapes']
        return self._jitted(
            f'dec_devwire_hyper{hy}x{wy}x{cy}_{num_lanes}_{z_lanes}'
            f'{self._dec_tag}',
            self._hyper_dec_fn(ops['shapes'], num_lanes, z_lanes))(
            self.variables, ops['z']['streams'], ops['z']['states'],
            ops['y']['streams'], ops['y']['states'], self._medians_dev,
            self._scale_table_dev, cdf, cdf_len, off, g_cdf, g_len, g_off)

    def decode_device_streams_hyper_batch(self, ops, num_lanes=None,
                                          z_lanes=None):
        """Batched server-side hyperprior program: k images' z/y streams
        -> k logits + k validity flags in one dispatch."""
        if num_lanes is None or z_lanes is None:
            auto_y, auto_z = self._auto_hyper_lanes_from_shapes(
                ops['shapes'])
            num_lanes = auto_y if num_lanes is None else num_lanes
            z_lanes = auto_z if z_lanes is None else z_lanes
        cdf, cdf_len, off = self._device_tables()
        g_cdf, g_len, g_off = self._device_gaussian_tables()
        (hy, wy, cy), _ = ops['shapes']
        k = int(ops['z']['streams'].shape[0])
        dec1 = self._hyper_dec_fn(ops['shapes'], num_lanes, z_lanes,
                                  batch_hint=k, aligned=True)
        return self._jitted(
            f'dec_devwire_hyper_b{k}_{hy}x{wy}x{cy}_{num_lanes}_{z_lanes}'
            f'a{self._dec_tag}',
            jax.vmap(dec1, in_axes=(None, 0, 0, 0, 0) + (None,) * 8))(
            self.variables, ops['z']['streams'], ops['z']['states'],
            ops['y']['streams'], ops['y']['states'], self._medians_dev,
            self._scale_table_dev, cdf, cdf_len, off, g_cdf, g_len, g_off)


    def _auto_wire_lanes(self, latent_shape):
        """Cyclic-compatible lane count for a latent shape. IMPORTANT:
        a lane count that is not a multiple of C silently disables the
        cyclic fast path AND the Pallas kernels in ops/rans/device.py
        (measured 27x slower at wire_batch=32), so the device-wire APIs
        default to this instead of a fixed 256."""
        from ..ops.rans.device import auto_lanes
        return auto_lanes(int(np.prod(latent_shape)),
                          cyclic_channels=int(latent_shape[-1]))

    def encode_device_wire(self, x, num_lanes=None):
        """Mobile-side program with the entropy coder FUSED into the same
        XLA program (`ops/rans/device.py`): one dispatch produces the
        per-lane rANS streams on-device. Nothing symbol-sized crosses the
        host boundary — the compacted bitstream (~entropy-sized) is pulled
        only for byte accounting, and the in-process decode consumes the
        device-resident streams directly."""
        from ..ops.rans.device import device_rans_encode
        if num_lanes is None:
            num_lanes = self._auto_wire_lanes(self._latent_shape(x.shape))
        cdf, cdf_len, off = self._device_tables()
        module = self._encode_module()

        def enc(variables, x, medians, cdf, cdf_len, off):
            ops = module.apply(
                variables, self._prep_input(x), medians,
                method=lambda m, x, med:
                    m.bottleneck_layer.encode_ops(x, med))
            sym = ops['symbols']
            n, h, w, c = sym.shape
            flat = sym.reshape(-1)
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32),
                           flat.shape[0] // c)
            out = device_rans_encode(flat, idx, cdf, cdf_len, off,
                                       num_lanes=num_lanes,
                                       cyclic_channels=c)
            # ok + exact wire size in ONE tiny array: the host reads it
            # with a single round trip (the accounted data size depends
            # only on the byte count, which is known on device)
            out['meta'] = jnp.stack([out['ok'].astype(jnp.int32),
                                     out['nbytes']])
            return out
        out = self._jitted(f'encode_devwire{num_lanes}{self._enc_tag}',
                           enc)(
            self.variables, x, self._medians_dev, cdf, cdf_len, off)
        out['shape'] = self._latent_shape(x.shape)
        return out

    def encode_device_wire_batch(self, xs_list, num_lanes=None):
        """`encode_device_wire` vmapped over k images. Each image is
        entropy-coded INDEPENDENTLY inside the program — per-image
        streams, states, and [ok, nbytes] metas are bit-identical to k
        separate batch-1 dispatches — so the reference's per-sample
        data-size protocol (README.md:99-103) is preserved while k images
        share ONE dispatch + ONE meta read (the stack happens inside the
        traced program, not as a separate device op)."""
        from ..ops.rans.device import device_rans_encode
        if num_lanes is None:
            num_lanes = self._auto_wire_lanes(
                self._latent_shape(tuple(xs_list[0].shape)))
        cdf, cdf_len, off = self._device_tables()
        module = self._encode_module()

        def enc1(variables, x, medians, cdf, cdf_len, off):
            ops = module.apply(
                variables, self._prep_input(x), medians,
                method=lambda m, x, med:
                    m.bottleneck_layer.encode_ops(x, med))
            sym = ops['symbols']
            c = sym.shape[-1]
            flat = sym.reshape(-1)
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32),
                           flat.shape[0] // c)
            out = device_rans_encode(flat, idx, cdf, cdf_len, off,
                                     num_lanes=num_lanes,
                                     cyclic_channels=c,
                                     batch_hint=len(xs_list),
                                     aligned=True)
            out['meta'] = jnp.stack([out['ok'].astype(jnp.int32),
                                     out['nbytes']])
            return out

        def enc_many(variables, medians, cdf, cdf_len, off, xs):
            return jax.vmap(
                enc1, in_axes=(None, 0, None, None, None, None))(
                variables, xs, medians, cdf, cdf_len, off)

        # one stacked (k, ...) input instead of k separate program
        # arguments: per-argument dispatch overhead grows superlinearly
        # with k on this runtime (measured 1.7k vs 10.2k img/s at k=128)
        k = len(xs_list)
        out = self._jitted(
            f'encode_devwire_b{k}_{num_lanes}a{self._enc_tag}', enc_many)(
            self.variables, self._medians_dev, cdf, cdf_len, off,
            _stack_group(xs_list))
        out['shape'] = self._latent_shape(tuple(xs_list[0].shape))
        return out

    def decode_device_streams_batch(self, streams, states, shape,
                                    num_lanes=None):
        """Batched server-side program: k images' device-resident streams
        -> k logits in one dispatch (vmap of `decode_device_streams`)."""
        from ..ops.rans.device import device_rans_decode
        if num_lanes is None:
            num_lanes = self._auto_wire_lanes(shape)
        cdf, cdf_len, off = self._device_tables()
        h, w, c = shape
        n_symbols = h * w * c

        k = int(streams.shape[0])
        module = self._decode_module()

        def dec1(variables, streams, states, medians, cdf, cdf_len, off):
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), h * w)
            flat, valid = device_rans_decode(
                streams, states, idx, cdf, cdf_len, off,
                n_symbols=n_symbols, num_lanes=num_lanes,
                cyclic_channels=c, batch_hint=k, aligned=True)
            sym = flat.reshape(1, h, w, c)

            def m_fn(m, s, med):
                feat = m.bottleneck_layer.decode_ops(s, med)
                return m.forward_tail(feat)
            logits = module.apply(variables, sym, medians, method=m_fn)
            return logits.astype(jnp.float32), valid
        return self._jitted(
            f'decode_devwire_b{k}_{h}x{w}x{c}_l{num_lanes}a{self._dec_tag}',
            jax.vmap(dec1, in_axes=(None, 0, 0, None, None, None, None)))(
            self.variables, streams, states, self._medians_dev,
            cdf, cdf_len, off)

    def _latent_shape(self, x_shape):
        """(h, w, c) of the bottleneck latent for an input shape (host
        ints, via eval_shape — no device work)."""
        key = ('latent_shape', tuple(x_shape))
        if key not in self._jit_cache:
            sym = jax.eval_shape(
                lambda v, x, m: self.module.apply(
                    v, x, m, method=lambda mod, x, med:
                        mod.bottleneck_layer.encode_ops(x, med)),
                self.variables, jax.ShapeDtypeStruct(tuple(x_shape),
                                                     jnp.float32),
                jax.ShapeDtypeStruct(self._medians_dev.shape, jnp.float32))
            self._jit_cache[key] = tuple(sym['symbols'].shape[1:])
        return self._jit_cache[key]

    def decode_device_streams(self, streams, states, shape, num_lanes=None):
        """Server-side program from device-resident (or uploaded) rANS
        streams: decode symbols + bottleneck decode + tail, one dispatch."""
        from ..ops.rans.device import device_rans_decode
        if num_lanes is None:
            num_lanes = self._auto_wire_lanes(shape)
        cdf, cdf_len, off = self._device_tables()
        h, w, c = shape
        n_symbols = h * w * c
        module = self._decode_module()

        def dec(variables, streams, states, medians, cdf, cdf_len, off):
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), h * w)
            flat, valid = device_rans_decode(
                streams, states, idx, cdf, cdf_len, off,
                n_symbols=n_symbols, num_lanes=num_lanes,
                cyclic_channels=c)
            sym = flat.reshape(1, h, w, c)

            def m_fn(m, s, med):
                feat = m.bottleneck_layer.decode_ops(s, med)
                return m.forward_tail(feat)
            logits = module.apply(variables, sym, medians, method=m_fn)
            return logits.astype(jnp.float32), valid
        return self._jitted(f'decode_devwire{h}x{w}x{c}_l{num_lanes}'
                            f'{self._dec_tag}', dec)(
            self.variables, streams, states, self._medians_dev,
            cdf, cdf_len, off)

    def _pull_device_wire(self, ops):
        """Compact the device streams for accounting: d2h of `lengths`
        (tiny) first, then a bucketed slice of the stream matrix — the
        transfer is ~entropy-sized instead of symbol-sized, and the
        bucket set bounds recompiles at log2(L)."""
        from ..ops.rans.device import pack_stream
        lengths = np.asarray(ops['lengths'])
        lmax = max(int(lengths.max()), 1)
        total = ops['streams'].shape[1]
        bucket = 1 << (lmax - 1).bit_length()
        bucket = min(bucket, total)
        sliced = self._jitted(
            f'devwire_slice{bucket}',
            lambda s: jax.lax.slice_in_dim(s, 0, bucket, axis=1))(
            ops['streams'])
        return pack_stream({'streams': np.asarray(sliced),
                            'lengths': lengths,
                            'states': np.asarray(ops['states'])})

    def stream_deploy_device(self, images, depth: int = 8, workers: int = 4,
                             num_lanes: int | None = None,
                             pull_wire: bool = False,
                             wire_batch: int | None = None,
                             timings: dict | None = None):
        """Pipelined batch-1 serving with the device-rANS wire: encode and
        entropy-code in ONE device program, account the compacted
        bitstream, decode from the device-resident streams (no
        symbol-sized transfer in either direction). Out-of-support
        latents (never produced by a trained model) fall back to the
        host-coder path per image."""
        import time as _time
        if self._module_level_ops:
            raise ValueError('device-rANS wire supports the splittable '
                             'bottleneck runtimes')
        hyper = isinstance(self.codec, HyperpriorCodec)
        images = list(images)
        n = len(images)
        if n == 0:
            return []
        if num_lanes is None:
            from ..ops.rans.device import auto_lanes
            shape = (self._hyper_latent_shapes(images[0].shape)[0] if hyper
                     else self._latent_shape(images[0].shape))
            num_lanes = auto_lanes(int(np.prod(shape)),
                                   cyclic_channels=None if hyper
                                   else int(shape[-1]))
        if wire_batch is not None and wire_batch > 1:
            if pull_wire:
                raise ValueError('wire_batch grouping does not support '
                                 'pull_wire packing (pull needs per-image '
                                 'stream syncs that defeat the grouping)')
            return self._stream_deploy_device_batched(
                images, wire_batch, depth, workers, num_lanes, timings)

        def dispatch(i):
            if hyper:
                ops = self.encode_device_wire_hyper(images[i],
                                                    num_lanes=num_lanes)
            else:
                ops = self.encode_device_wire(images[i],
                                              num_lanes=num_lanes)
            copy_async(ops['meta'])
            return i, ops

        def host_stage(arg):
            # Decode is dispatched WITHOUT waiting for the meta read: the
            # decode program consumes the device-resident streams, so the
            # steady-state loop performs no blocking host transfer at all.
            # Metas (8 bytes, async-copied at dispatch) are harvested after
            # the stream drains — accounting is order-insensitive and the
            # ok=0 escape path (never produced by a trained model) is
            # redone serially then.
            i, ops = arg
            t0 = _time.perf_counter()
            if hyper:
                logits, valid = self.decode_device_streams_hyper(
                    ops, num_lanes=num_lanes)
                shape_hw = ops['shapes'][1][:2]
            else:
                logits, valid = self.decode_device_streams(
                    ops['streams'], ops['states'], ops['shape'],
                    num_lanes=num_lanes)
                shape_hw = ops['shape'][:2]
            copy_async(valid)
            add_timing(timings, 'decode_dispatch',
                       _time.perf_counter() - t0)
            if pull_wire:
                # wire packing needs the stream content: sync here
                ok, nbytes = (int(v) for v in np.asarray(ops['meta']))
                if ok and bool(np.asarray(valid)):
                    # hyperprior wires concatenate z then y; each lane
                    # wire is self-describing (header carries lane count
                    # + lengths) so the pair splits without a frame —
                    # `ops.rans.device.split_wire` recovers the parts.
                    # Accounting happens at drain (stream order): worker
                    # threads complete out of order.
                    wire = (self._pull_device_wire(ops['z'])
                            + self._pull_device_wire(ops['y'])) if hyper \
                        else self._pull_device_wire(ops)
                    assert len(wire) == nbytes
                    return i, wire, shape_hw, logits
                return i, ops['meta'], shape_hw, logits, valid
            if i % 32 == 31:
                # throttle: one meta wait every 32 images bounds the queued
                # device programs (and buffers) without a per-image sync
                np.asarray(ops['meta'])
            return i, ops['meta'], shape_hw, logits, valid

        staged = list(pipeline_stream(n, dispatch, host_stage, depth,
                                      workers))
        # Harvest AFTER the stream drains: every meta's async copy has had
        # the whole stream's wall time to complete, so these reads are
        # host-local, not per-image tunnel syncs.
        t_acct = _time.perf_counter()
        results = []
        for r in staged:
            if len(r) == 4:        # pull_wire path: real packed stream
                i, wire, shape_hw, logits = r
                self.analyze({'strings': [[wire]], 'shape': shape_hw})
                results.append(logits)
                continue
            i, meta, shape_hw, logits, valid = r
            ok, nbytes = (int(v) for v in np.asarray(meta))
            # `valid` certifies every rANS lane returned to its initial
            # state — decoding a corrupt (or miscompiled-kernel) stream
            # cannot pass it; such images are redone on the host path
            if not ok or not bool(np.asarray(valid)):
                # escape-coded latent or failed decode: serial host path
                compressed = self.encode(images[i])
                self.analyze(compressed)
                results.append(self.decode(**compressed))
                continue
            # account the EXACT wire size without pulling content: pickle
            # size of a bytes object depends only on length
            self.analyze({'strings': [[bytes(nbytes)]], 'shape': shape_hw})
            results.append(logits)
        add_timing(timings, 'account_d2h',
                   _time.perf_counter() - t_acct)
        jax.block_until_ready(results[-1])
        return results

    def _stream_deploy_device_batched(self, images, k, depth, workers,
                                      num_lanes, timings):
        """Grouped device-wire serving: k images per fused encode+code /
        decode+tail dispatch and ONE (k,2) meta read per group — ~2/k
        tunnel operations per image. Per-image bitstreams, byte
        accounting, and logits are identical to the per-image wire (each
        image is coded independently inside the vmapped program); the
        last group is padded by repeating its final image (padded outputs
        dropped, never accounted)."""
        import time as _time
        n = len(images)
        hyper = isinstance(self.codec, HyperpriorCodec)
        # only consecutive SAME-SHAPE images can share a stacked dispatch
        # (a mixed-resolution stream would fail inside jnp.stack); a shape
        # change closes the group, exactly like the det/seg mixin
        groups = []
        i = 0
        while i < n:
            j = i + 1
            while j < n and j - i < k \
                    and images[j].shape == images[i].shape:
                j += 1
            groups.append((i, j))
            i = j

        def dispatch(g):
            j0, j1 = groups[g]
            grp = list(images[j0:j1])
            grp += [grp[-1]] * (k - len(grp))
            ops = (self.encode_device_wire_hyper_batch(
                       grp, num_lanes=num_lanes) if hyper
                   else self.encode_device_wire_batch(
                       grp, num_lanes=num_lanes))
            copy_async(ops['meta'])
            return g, ops

        def host_stage(arg):
            g, ops = arg
            t0 = _time.perf_counter()
            if hyper:
                logits, valid = self.decode_device_streams_hyper_batch(
                    ops, num_lanes=num_lanes)
            else:
                logits, valid = self.decode_device_streams_batch(
                    ops['streams'], ops['states'], ops['shape'],
                    num_lanes=num_lanes)
            copy_async(valid)
            add_timing(timings, 'decode_dispatch',
                       _time.perf_counter() - t0)
            if g % 8 == 7:
                # throttle: one meta wait per 8 groups bounds queued
                # device programs without a per-group sync
                np.asarray(ops['meta'])
            shape_hw = (ops['shapes'][1][:2] if hyper
                        else ops['shape'][:2])
            return g, ops['meta'], shape_hw, logits, valid

        staged = list(pipeline_stream(len(groups), dispatch, host_stage,
                                      depth, workers))
        t_acct = _time.perf_counter()
        results = []
        for g, meta, shape_hw, logits, valid in staged:
            j0, j1 = groups[g]
            meta_np = np.asarray(meta)
            valid_np = np.asarray(valid)
            for j in range(j1 - j0):
                ok, nbytes = int(meta_np[j, 0]), int(meta_np[j, 1])
                if not ok or not bool(valid_np[j]):
                    # escape-coded latent or failed decode: host path
                    compressed = self.encode(images[j0 + j])
                    self.analyze(compressed)
                    results.append(self.decode(**compressed))
                    continue
                self.analyze({'strings': [[bytes(nbytes)]],
                              'shape': shape_hw})
                results.append(logits[j])
        add_timing(timings, 'account_d2h',
                   _time.perf_counter() - t_acct)
        jax.block_until_ready(results[-1])
        return results

    # ---- async deploy pieces (for pipelined batch-1 streaming) ----------
    _to_wire = staticmethod(to_wire)

    def encode_device(self, x):
        """Dispatch the mobile-side program; returns device arrays (int16
        wire dtype) without host sync (lets callers overlap the next encode
        with host coding)."""
        if isinstance(self.codec, HyperpriorCodec):
            def enc(variables, x, z_medians, scale_table):
                return self._to_wire(self.module.apply(
                    variables, self._prep_input(x), z_medians, scale_table,
                    method=lambda m, x, zm, st:
                        m.bottleneck_layer.encode_ops(x, zm, st)))
            return self._jitted('encode', enc)(
                self.variables, x, self._medians_dev, self._scale_table_dev)
        if self._module_level_ops:
            def enc(variables, x, medians):
                return self._to_wire(self.module.apply(
                    variables, self._prep_input(x), medians,
                    method=lambda m, x, med: m.encode_ops(x, med)))
        else:
            def enc(variables, x, medians):
                return self._to_wire(self.module.apply(
                    variables, self._prep_input(x), medians,
                    method=lambda m, x, med:
                        m.bottleneck_layer.encode_ops(x, med)))
        return self._jitted('encode', enc)(self.variables, x,
                                           self._medians_dev)

    def stream_deploy(self, images, depth: int = 8, workers: int = 4,
                      timings: dict | None = None, decode_batch: int = 1):
        """Software-pipelined batch-1 deploy over a stream of images — the
        production serving loop for the reference's eval protocol
        (SURVEY.md §3.2, batch=1 per README.md:99-103). Returns the list of
        per-image logits (device arrays, in order).

        Pipelining structure: `depth` encodes are kept in flight on the
        device with async device->host symbol copies; a small thread pool
        overlaps the host stages (transfer sync + rANS encode + byte
        accounting + rANS decode + decode dispatch) across images, since
        each host sync costs a tunnel round trip. Byte accounting is
        per-sample, identical to the serial path.

        `decode_batch > 1` (production serving mode) additionally fuses the
        server-side program over k consecutive images: each image is still
        encoded, entropy-coded, measured, and entropy-decoded individually
        (per-sample bitstreams/data sizes are untouched — the reference's
        batch-1 protocol, README.md:99-103, constrains the *measurement*),
        but the decoded latents run the decoder+tail as one (k, h, w, c)
        dispatch on a dedicated thread that overlaps the next images' host
        stages. Logits are numerically equivalent to batch-1 up to
        batched-reduction rounding (asserted to 2e-5 in tests); the fused
        dispatch is timed into `timings['decode_dispatch']`."""
        import time as _time

        images = list(images)
        n = len(images)
        if n == 0:
            return []

        def dispatch(i):
            ops = self.encode_device(images[i % n])
            copy_async(ops)
            return ops

        batched = decode_batch > 1
        if batched and (isinstance(self.codec, HyperpriorCodec)
                        or self._module_level_ops):
            raise ValueError(
                'decode_batch > 1 is implemented for the factorized-prior '
                'bottleneck runtime only (got '
                f'{type(self.codec).__name__}); run with decode_batch=1')

        def host_stage(ops):
            t0 = _time.perf_counter()
            if isinstance(self.codec, HyperpriorCodec):
                # all three tensors stay in the int16 wire dtype
                y_sym = np.asarray(ops['y_symbols'])
                y_idx = np.asarray(ops['y_indexes'])
                z_sym = np.asarray(ops['z_symbols'])
                t1 = _time.perf_counter()
                strings = [self.codec.compress_y_wire(y_sym, y_idx),
                           self.codec.compress_wire(z_sym)]
                compressed = {'strings': strings,
                              'shape': tuple(z_sym.shape[1:3])}
            else:
                sym = np.asarray(ops['symbols'])  # int16 wire dtype
                t1 = _time.perf_counter()
                strings = self.codec.compress_wire(sym)
                compressed = {'strings': [strings],
                              'shape': tuple(sym.shape[1:3])}
            self.analyze(compressed)
            t2 = _time.perf_counter()
            if batched:
                # return decoded symbols; the server-side program runs
                # micro-batched in submission order below
                channels = self.codec.tables.medians.shape[0]
                out = self.codec.decompress_wire(
                    compressed['strings'][0], compressed['shape'], channels)
            elif isinstance(self.codec, HyperpriorCodec):
                out = self._decode_hyper_wire(compressed['strings'],
                                              compressed['shape'])
            else:
                out = self._decode_wire(compressed['strings'][0],
                                        compressed['shape'])
            t3 = _time.perf_counter()
            add_timing(timings, 'd2h_sync', t1 - t0)
            add_timing(timings, 'host_code', t2 - t1)
            add_timing(timings, 'decode_dispatch', t3 - t2)
            return out

        stream = pipeline_stream(n, dispatch, host_stage, depth, workers)
        if batched:
            # micro-batch the server-side program over k images: per-
            # sample bitstreams and byte accounting are untouched (the
            # batch-1 *measurement* protocol concerns data size, which
            # is computed per image above); only decode compute fuses.
            # Flushes run on a dedicated single thread so the consumer
            # keeps draining the stream while the (k,h,w,c) upload +
            # dispatch is in flight — a synchronous flush stalls the whole
            # pipeline every k images.
            from concurrent.futures import ThreadPoolExecutor
            flush_futures, buf = [], []

            def run_flush(chunk):
                k = len(chunk)
                t0 = _time.perf_counter()
                stacked = np.concatenate(chunk)
                if k < decode_batch:  # pad to one static shape
                    pad = np.zeros(
                        (decode_batch - k,) + chunk[0].shape[1:],
                        chunk[0].dtype)
                    stacked = np.concatenate([stacked, pad])
                logits = self._decode_call(jnp.asarray(stacked))
                add_timing(timings, 'decode_dispatch',
                           _time.perf_counter() - t0)
                return [logits[i:i + 1] for i in range(k)]

            with ThreadPoolExecutor(1) as flush_ex:
                for decoded in stream:
                    buf.append(decoded)
                    if len(buf) == decode_batch:
                        flush_futures.append(
                            flush_ex.submit(run_flush, buf))
                        buf = []
                if buf:
                    flush_futures.append(flush_ex.submit(run_flush, buf))
                results = [r for f in flush_futures for r in f.result()]
        else:
            results = list(stream)
        jax.block_until_ready(results[-1])
        return results

    def __call__(self, x, rng=None):
        """Reference forward dispatch (`backbone.py:225-254`): deploy path
        when updated & eval, finetune path when updated & training,
        noise path otherwise."""
        if self.bottleneck_updated and not self.training:
            compressed = self.encode(x)
            self.analyze(compressed)
            return self.decode(**compressed)
        mode = 'finetune' if self.bottleneck_updated else 'train'
        if rng is None:
            rng = jax.random.key(0)
        return self._forward_train_mode(x, mode, rng)
