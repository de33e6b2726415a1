"""Device-side (TPU) interleaved rANS entropy codec — pure XLA, jittable.

The reference's entropy coding runs in CompressAI's serial C++ on the host
(`/root/reference/sc2bench/models/layer.py:506,520`); this repo's C++ coder
(`rans.cpp`) reproduces that placement and format. This module is the
TPU-native alternative: N independent rANS lanes encoded/decoded as one
vectorized `lax.scan` ON the accelerator, so the deploy pipeline can ship
the ~entropy-sized bitstream across the host boundary instead of the raw
symbol tensor (5-15x fewer device<->host bytes), and a real two-node
deployment entropy-codes at memory-bandwidth rate with zero host work.

Why this is jittable where the CompressAI format is not: the C++ format
renormalizes in 8-bit chunks (0-3 emissions per symbol — data-dependent
control flow). Here the state is 32-bit, the probability precision is 16
bits, and renormalization moves 16 bits at a time; with state invariant
x in [2^16, 2^32), each encode step emits EXACTLY 0 or 1 uint16 and each
decode step reads exactly 0 or 1 — static shapes, so the whole codec is a
`lax.scan` of elementwise uint32 arithmetic + CDF gathers over (L, N)
blocks (L = ceil(n/num_lanes) steps, N lanes in the vector dimension).

Format ("tpu-lane-v1", self-describing, NOT the CompressAI wire format —
the reference measurement protocol keeps the host coder; this is the
serving fast path):
  - symbols are distributed lane-major: lane j codes positions j, j+N, ...
  - per lane: final encoder state (uint32) + its uint16 renorm stream in
    decode order; `pack_stream` lays out [N, lengths(u16 each), states,
    streams] and `unpack_stream` restores the device arrays.
  - out-of-range symbols (outside the CDF support) are NOT escape-coded;
    `encode` returns `ok=False` and the caller falls back to the host
    coder (trained latents are in-support by construction of `update()`).

Bit-exactness: the same integer arithmetic runs on TPU and CPU backends
(uint32 ops are exact); `numpy_oracle_encode/decode` pin the format
independently of XLA.
"""
from __future__ import annotations

import threading

import numpy as np

import jax
import jax.numpy as jnp

PRECISION = 16
RANS_L = np.uint32(1) << 16          # state lower bound (= renorm base)
_MASK16 = np.uint32((1 << 16) - 1)


def auto_lanes(n_symbols: int, target_steps: int = 256, lo: int = 16,
               hi: int = 4096, cyclic_channels: int | None = None) -> int:
    """Lane count aiming at ~target_steps scan iterations: big latents
    get wide vectorization, tiny ones avoid paying the 6-byte per-lane
    state/length overhead. With `cyclic_channels=C` the count is C * 2^k
    (so every lane holds ONE fixed channel — enables the gather-free
    fixed-lane-CDF fast path), else a power of two."""
    want = max(n_symbols // target_steps, 1)
    if cyclic_channels:
        c = int(cyclic_channels)
        k = max((want // c), 1)
        lanes = c * (1 << max((k - 1).bit_length(), 0))
        while lanes > hi and lanes > c:
            lanes //= 2
        return max(min(lanes, hi if hi >= c else lanes), min(lo, lanes))
    lanes = 1 << (want - 1).bit_length()
    return max(lo, min(hi, lanes))


_PALLAS_PROBE_OK: bool | None = None
_PALLAS_PROBE_LOCK = threading.Lock()


def _probe_pallas_kernels() -> bool:
    """One-time self-check before the `auto` gate ever selects the
    compiled Pallas kernels: encode/decode a small deterministic cyclic
    case with the kernels and require byte-identical wire + symbols vs
    the XLA scan. Any exception (Mosaic toolchain drift, unsupported op)
    or mismatch permanently disables the Pallas fast path for this
    process — the XLA scan is always correct, just slower. Shape
    coverage is not exhaustive (kernels are shape-specialized), but the
    probe catches the realistic failure class: toolchain-level breakage."""
    global _PALLAS_PROBE_OK
    if _PALLAS_PROBE_OK is not None:
        return _PALLAS_PROBE_OK
    with _PALLAS_PROBE_LOCK:
        if _PALLAS_PROBE_OK is not None:  # lost the race: reuse verdict
            return _PALLAS_PROBE_OK
        _PALLAS_PROBE_OK = _run_pallas_probe()
    return _PALLAS_PROBE_OK


def _run_pallas_probe() -> bool:
    try:
        # The gate fires at jit-TRACE time (inside the user's enc/dec
        # program trace). JAX trace contexts are thread-local, so running
        # the probe on a worker thread gives it a clean eval context —
        # its jits execute eagerly instead of staging into the caller's
        # trace (where device_get would raise and poison the verdict).
        # NOT ensure_compile_time_eval: under that, zero-operand ops
        # (iota/full/zeros) inside the KERNEL trace also evaluate eagerly
        # and surface as Mosaic 'captures constants' lowering errors.
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(1) as pool:
            return pool.submit(_run_pallas_probe_body).result()
    except Exception as e:  # noqa: BLE001 — any failure means fall back
        _warn_probe_failed(repr(e))
        return False


def _warn_probe_failed(reason: str) -> None:
    import logging
    logging.getLogger(__name__).warning(
        'Pallas rANS kernel self-check failed on backend %r (%s); '
        'falling back to the XLA scan codec (correct, slower). '
        'Set SC2_RANS_BACKEND=pallas to force the kernel.',
        jax.default_backend(), reason)


def _run_pallas_probe_body() -> bool:
    C, cols, steps = 8, 12, 24
    cdf, cdf_len, off, k, rng = _synthetic_cyclic_tables(C, cols)
    # nonzero per-channel offsets: the probe must cover the v + off path
    off = np.arange(C, dtype=np.int32) - 4
    ok = True
    # 128 = the pure kernel layout; 96 = the inert-lane-padded
    # lowering that non-multiple-of-128 deploy shapes take
    for lanes in (128, 96):
        n = lanes * steps
        idx = np.tile(np.arange(C, dtype=np.int32), n // C)
        sym = (rng.integers(0, k, n).astype(np.int32) + off[idx])
        ref = jax.device_get(device_rans_encode(
            sym, idx, cdf, cdf_len, off, num_lanes=lanes,
            cyclic_channels=C, backend='xla'))
        got = jax.device_get(device_rans_encode(
            sym, idx, cdf, cdf_len, off, num_lanes=lanes,
            cyclic_channels=C, backend='pallas'))
        ok = ok and bool(ref['ok']) and all(
            np.array_equal(ref[f], got[f])
            for f in ('streams', 'lengths', 'states'))
        dec, valid = device_rans_decode(
            ref['streams'], ref['states'], idx, cdf, cdf_len, off,
            n_symbols=n, num_lanes=lanes, cyclic_channels=C,
            backend='pallas')
        ok = ok and bool(valid) \
            and np.array_equal(jax.device_get(dec), sym)
        # wire_batch runs BOTH kernels UNDER vmap (batched Mosaic
        # grid — a different lowering); probe that path too
        gotb = jax.device_get(jax.vmap(
            lambda s: device_rans_encode(
                s, idx, cdf, cdf_len, off, num_lanes=lanes,
                cyclic_channels=C, backend='pallas'))(
            jnp.stack([jnp.asarray(sym)] * 2)))
        ok = ok and all(
            np.array_equal(np.stack([ref[f]] * 2), gotb[f])
            for f in ('streams', 'lengths', 'states'))
        decb, validb = jax.vmap(
            lambda st, xs: device_rans_decode(
                st, xs, idx, cdf, cdf_len, off, n_symbols=n,
                num_lanes=lanes, cyclic_channels=C,
                backend='pallas'))(
            jnp.stack([jnp.asarray(ref['streams'])] * 2),
            jnp.stack([jnp.asarray(ref['states'])] * 2))
        ok = ok and bool(jax.device_get(validb).all()) \
            and np.array_equal(jax.device_get(decb),
                               np.stack([sym] * 2))
        # ALIGNED layout: kernels vs the aligned XLA scan, plus the
        # round trip, unbatched and under vmap (the batched-serving
        # lowering). Wire equality also pins compacted == compact(aligned)
        refa = jax.device_get(device_rans_encode(
            sym, idx, cdf, cdf_len, off, num_lanes=lanes,
            cyclic_channels=C, backend='xla', aligned=True,
            want_masks=True))
        ok = ok and pack_stream_aligned(refa) == pack_stream(ref)
        gota = jax.device_get(device_rans_encode(
            sym, idx, cdf, cdf_len, off, num_lanes=lanes,
            cyclic_channels=C, backend='pallas', aligned=True))
        ok = ok and all(
            np.array_equal(refa[f], gota[f])
            for f in ('streams', 'lengths', 'states'))
        deca, valida = device_rans_decode(
            refa['streams'], refa['states'], idx, cdf, cdf_len, off,
            n_symbols=n, num_lanes=lanes, cyclic_channels=C,
            backend='pallas', aligned=True)
        ok = ok and bool(valida) \
            and np.array_equal(jax.device_get(deca), sym)
        gotab = jax.device_get(jax.vmap(
            lambda s: device_rans_encode(
                s, idx, cdf, cdf_len, off, num_lanes=lanes,
                cyclic_channels=C, backend='pallas', aligned=True))(
            jnp.stack([jnp.asarray(sym)] * 2)))
        ok = ok and all(
            np.array_equal(np.stack([refa[f]] * 2), gotab[f])
            for f in ('streams', 'lengths', 'states'))
        decab, validab = jax.vmap(
            lambda st, xs: device_rans_decode(
                st, xs, idx, cdf, cdf_len, off, n_symbols=n,
                num_lanes=lanes, cyclic_channels=C,
                backend='pallas', aligned=True))(
            jnp.stack([jnp.asarray(refa['streams'])] * 2),
            jnp.stack([jnp.asarray(refa['states'])] * 2))
        ok = ok and bool(jax.device_get(validab).all()) \
            and np.array_equal(jax.device_get(decab),
                               np.stack([sym] * 2))
    if not ok:
        _warn_probe_failed('kernel output mismatched the XLA scan')
    return ok


def _resolve_backend(backend: str) -> str:
    """Apply the SC2_RANS_BACKEND env override to 'auto'. Call sites must
    resolve BEFORE deriving `interpret=` flags — otherwise the env's
    'pallas-interpret' would select the Pallas path but run it compiled."""
    import os
    if backend == 'auto':
        return os.environ.get('SC2_RANS_BACKEND', 'auto')
    return backend


def _use_pallas(backend: str, cols: int, lanes: int, lmax: int,
                steps: int, mode: str = 'decode',
                cyc: int = 0, batch: int = 1,
                emit_masks: bool = False) -> bool:
    """Trace-time backend gate for the cyclic encode/decode fast paths.
    `backend` must already be resolved via `_resolve_backend`. Under
    'auto' the verdict is a per-shape AUTOTUNE: after the one-time
    bit-exactness probe, both backends are timed at this exact
    (cols, lanes, lmax, steps) on device and the faster one is cached —
    the kernel wins big on VMEM-bound decode shapes but can lose to the
    XLA scan on small-lane encodes, so a static heuristic would leave
    throughput on the table in one direction or the other."""
    if backend in ('pallas', 'pallas-interpret'):
        return True
    if backend != 'auto':
        return False
    if jax.default_backend() != 'tpu':
        return False
    from .pallas_kernel import (pick_decode_plan, pick_decode_plan_aligned,
                                pick_encode_plan, pick_encode_plan_aligned)
    if mode == 'encode':
        applies = pick_encode_plan(int(cols), int(lanes),
                                   int(steps)) is not None
    elif mode == 'encode_aligned':
        # emit_masks grows the call's output VMEM footprint — gate on
        # the SAME plan the kernel call will pick, or want_masks callers
        # crash instead of falling back to the XLA scan
        applies = pick_encode_plan_aligned(int(cols), int(lanes),
                                           int(steps),
                                           emit_masks) is not None
    elif mode == 'decode_aligned':
        applies = pick_decode_plan_aligned(int(cols), int(lanes),
                                           int(steps)) is not None
    else:
        applies = pick_decode_plan(int(cols), int(lanes), int(lmax),
                                   int(steps)) is not None
    if not (applies and _probe_pallas_kernels()):
        return False
    if int(batch) > 1:
        # batched (vmapped) callers: the kernel is the static choice —
        # the vmapped XLA scan collapses (measured 92 ms vs 1.8 ms for a
        # 32-image flagship decode, 27x; encode ~6x) and timing the XLA
        # candidate would force a multi-minute batched-scan compile at
        # serving warmup for a verdict that never flips.
        return True
    return _autotune_pallas(mode, int(cols), int(lanes), int(lmax),
                            int(steps), int(cyc), int(batch))


_PALLAS_TUNE_CHOICE: dict = {}
_PALLAS_TUNE_LOCKS: dict = {}


def _autotune_pallas(mode: str, cols: int, lanes: int, lmax: int,
                     steps: int, cyc: int, batch: int = 1) -> bool:
    """Measured per-shape backend choice, cached for the process. Runs on
    a worker thread (clean trace context — see `_run_pallas_probe`); any
    failure falls back to the XLA scan for that shape. Timing runs under
    a PER-KEY lock so concurrent first-traces of different deploy shapes
    don't serialize behind one shape's (slow, tunnel-bound) measurement."""
    key = (mode, cols, lanes, lmax, steps, cyc, batch)
    hit = _PALLAS_TUNE_CHOICE.get(key)
    if hit is not None:
        return hit
    with _PALLAS_PROBE_LOCK:   # only guards the tiny lock-registry op
        key_lock = _PALLAS_TUNE_LOCKS.setdefault(key, threading.Lock())
    with key_lock:
        hit = _PALLAS_TUNE_CHOICE.get(key)
        if hit is not None:
            return hit
        from concurrent.futures import ThreadPoolExecutor
        try:
            with ThreadPoolExecutor(1) as pool:
                t_xla, t_pal = pool.submit(
                    _time_pallas_vs_xla, mode, cols, lanes, lmax, steps,
                    cyc, batch).result()
            # scan wins ties: it has no Mosaic-toolchain risk surface
            choice = bool(t_pal < 0.95 * t_xla)
            import logging
            logging.getLogger(__name__).info(
                'rANS autotune %s cols=%d lanes=%d lmax=%d steps=%d '
                'batch=%d: xla %.3f ms, pallas %.3f ms -> %s', mode,
                cols, lanes, lmax, steps, batch, t_xla * 1e3,
                t_pal * 1e3, 'pallas' if choice else 'xla')
        except Exception as e:  # noqa: BLE001 — timing failure => scan
            _warn_probe_failed(f'autotune {mode} {key}: {e!r}')
            choice = False
        _PALLAS_TUNE_CHOICE[key] = choice
    return choice


def _synthetic_cyclic_tables(C: int, cols: int, seed: int = 0):
    """Random normalized-to-2^16 cyclic CDF tables (shared by the
    bit-exactness probe and the autotune timer)."""
    rng = np.random.default_rng(seed)
    support = max(cols - 3, 2)
    cdf = np.zeros((C, cols), np.int32)
    cdf_len = np.full((C,), support + 2, np.int32)
    off = np.zeros((C,), np.int32)
    for c in range(C):
        w = rng.uniform(0.05, 1.0, support + 1)
        freqs = np.maximum((w / w.sum() * (1 << 16)).astype(np.int64), 1)
        freqs[-1] += (1 << 16) - freqs.sum()
        cdf[c, 1:support + 2] = np.cumsum(freqs)
    return cdf, cdf_len, off, support, rng


def _time_pallas_vs_xla(mode, cols, lanes, lmax, steps, cyc, batch=1):
    """Median per-call seconds of (xla, pallas) at a synthetic case of the
    given shape. With `batch` > 1 the candidates are timed UNDER a vmap
    of that width — the per-image verdict does not transfer (measured:
    xla ~= pallas per image at the flagship shape, but the vmapped XLA
    scan collapses ~27x at batch 32 while the kernel scales), so a
    batched caller must be tuned at its own batch."""
    import time
    C = max(cyc, 1)
    cdf, cdf_len, off, support, rng = _synthetic_cyclic_tables(C, cols)
    n = lanes * steps
    idx = (np.arange(n, dtype=np.int32) % lanes) % C
    sym = rng.integers(0, support, n).astype(np.int32)

    def batched(fn):
        return fn if batch <= 1 else jax.vmap(fn)

    def tile(a):
        a = jnp.asarray(a)
        return a if batch <= 1 else jnp.stack([a] * batch)

    aligned = mode.endswith('_aligned')
    if mode.startswith('encode'):
        def run(backend):
            # the timed program must DEPEND on every encode output:
            # returning only 'states' would let XLA dead-code-eliminate
            # the scan's chunk/mask emission and the stream compaction
            # from the 'xla' candidate while the (DCE-opaque) Pallas
            # custom call still computes them — a biased A/B
            def one(s):
                out = device_rans_encode(
                    s, idx, cdf, cdf_len, off, num_lanes=lanes,
                    cyclic_channels=C, backend=backend, aligned=aligned)
                return (jnp.sum(out['states'])
                        + jnp.sum(out['streams'].astype(jnp.uint32))
                        + jnp.sum(out['lengths'].astype(jnp.uint32)))
            full = lambda s: jnp.sum(batched(one)(s))  # noqa: E731
            return jax.jit(full), (tile(sym),)
    else:
        enc = device_rans_encode(sym, idx, cdf, cdf_len, off,
                                 num_lanes=lanes, cyclic_channels=C,
                                 backend='xla', aligned=aligned)
        src = np.asarray(jax.device_get(enc['streams']))
        if aligned:
            streams = src                      # width == steps by format
        else:
            streams = np.zeros((lanes, lmax), np.uint16)
            w = min(lmax, src.shape[1])
            streams[:, :w] = src[:, :w]
        states = np.asarray(jax.device_get(enc['states']))

        def run(backend):
            def one(st, xs):
                flat, valid = device_rans_decode(
                    st, xs, idx, cdf, cdf_len, off, n_symbols=n,
                    num_lanes=lanes, cyclic_channels=C, backend=backend,
                    aligned=aligned)
                return jnp.sum(flat) + valid.astype(jnp.int32)
            full = lambda st, xs: jnp.sum(batched(one)(st, xs))  # noqa: E731
            return jax.jit(full), (tile(streams), tile(states))

    # Compile/warm both first, then INTERLEAVE trials: the remote-tunnel
    # load drifts minute to minute, and timing one backend fully before
    # the other would let that drift decide the verdict. The timed
    # programs return SCALARS, so the final np.asarray is a true 4-byte
    # execution barrier — jax.block_until_ready resolves WITHOUT waiting
    # on this tunnel (see bench.py:force) and would time dispatch only.
    fns = []
    for backend in ('xla', 'pallas'):
        fn, args = run(backend)
        np.asarray(fn(*args))                     # compile + warm + sync
        fns.append((fn, args))
    reps, trials = (8 if batch <= 1 else 3), ([], [])
    for _ in range(5 if batch <= 1 else 3):
        for i, (fn, args) in enumerate(fns):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(*args)
            np.asarray(r)
            trials[i].append((time.perf_counter() - t0) / reps)
    return (float(np.median(trials[0])), float(np.median(trials[1])))


def cdf_bisect(cdf, cdf_len, idx, slot, steps: int | None = None):
    """v with cdf[idx, v] <= slot < cdf[idx, v+1] — fixed-depth binary
    search using POINT gathers only. Materializing cdf[idx] rows per
    step costs >100 ms/img for wide (e.g. 64 x ~3.2k) gaussian tables
    on the TPU gather engine (measured for the JAHP wavefront wire and
    the general decode path alike). Invariant from (lo=0, hi=len-1):
    every cdf row starts at 0 and ends at 2^16 > slot within cdf_len,
    and `steps` >= ceil(log2(row width)) probes reach hi == lo+1.
    Shared by `device_rans_decode`'s general path and
    `models/zoo_jahp_device.py`."""
    if steps is None:
        steps = max(int(np.ceil(np.log2(max(int(cdf.shape[-1]), 2)))), 1)
    lo = jnp.zeros_like(idx)
    hi = cdf_len[idx] - 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        go_right = cdf[idx, mid] <= slot
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _blocks(symbols, indexes, num_lanes):
    """Pad to a multiple of num_lanes (with index-0 symbols at the lowest
    in-support value) and reshape lane-major to (L, N)."""
    n = symbols.shape[0]
    lanes = int(num_lanes)
    steps = -(-n // lanes)
    pad = steps * lanes - n
    if pad:
        symbols = jnp.concatenate(
            [symbols, jnp.zeros((pad,), symbols.dtype)])
        indexes = jnp.concatenate(
            [indexes, jnp.zeros((pad,), indexes.dtype)])
    return (symbols.reshape(steps, lanes), indexes.reshape(steps, lanes),
            n, pad)


def device_rans_encode(symbols, indexes, quantized_cdf, cdf_length, offset,
                       num_lanes: int = 256,
                       cyclic_channels: int | None = None,
                       backend: str = 'auto', batch_hint: int = 1,
                       aligned: bool = False, want_masks: bool = False):
    """Encode flat int32 `symbols` with per-symbol distribution `indexes`
    against 16-bit-precision CDF tables (the same tables the host coder
    uses). Returns dict with:
      streams (N, L) uint16  — per-lane renorm chunks, decode order,
                               zero-padded to L
      lengths (N,) int32     — valid chunks per lane
      states  (N,) uint32    — final per-lane states (decoder init)
      ok      ()  bool       — all symbols in CDF support (else fall back
                               to the host escape-coding path)
      nbytes  ()  int32      — exact packed wire size
    Jittable; all shapes static given (n, num_lanes).

    `aligned=True` switches the in-memory stream layout from compacted
    to TIME-ALIGNED: streams[:, t] holds the chunk emitted while coding
    symbol row t (0 where none). rANS renorm emissions/consumptions are
    symmetric per symbol position, so an aligned decoder reads row t
    directly — no per-lane pointer chase — and the encoder skips the
    compaction pass entirely (the dominant cost of the compacted
    kernels). The per-lane chunk SEQUENCES, lengths, states, and hence
    the packed wire bytes are identical; only the layout differs.
    `want_masks=True` additionally returns 'masks' (N, L) bool marking
    real chunks, which `pack_stream_aligned` uses to produce the exact
    compacted wire on the host."""
    backend = _resolve_backend(backend)
    cdf = jnp.asarray(quantized_cdf, jnp.int32)
    cdf_len = jnp.asarray(cdf_length, jnp.int32)
    off = jnp.asarray(offset, jnp.int32)
    sym2, idx2, n, pad = _blocks(jnp.asarray(symbols, jnp.int32),
                                 jnp.asarray(indexes, jnp.int32), num_lanes)
    steps, lanes = sym2.shape
    cyc = int(cyclic_channels) if cyclic_channels else 0
    if cyc and lanes % cyc != 0:
        cyc = 0   # lane channel not fixed; use the general gather path
    if cyc:
        # lane j always holds channel j % C: per-lane CDF rows replace
        # every per-symbol table gather (gathers are the TPU bottleneck)
        lane_ch = jnp.arange(lanes, dtype=jnp.int32) % cyc
        cdf_lane = cdf[lane_ch]                  # (N, cols), built once
        off_lane = off[lane_ch]
        maxv_lane = cdf_len[lane_ch] - 2
    # When padding, the pad symbols must be in-support (v=0: every cdf
    # row starts at 0 with freq >= 1 by construction).
    if pad:
        lane_pos = jnp.arange(lanes)
        pad_mask = (jnp.arange(steps)[:, None] * lanes + lane_pos) >= n
        # lane-major: position of (t, j) in the flat order is t*lanes+j
        if cyc:
            sym2 = jnp.where(pad_mask, off_lane[None, :], sym2)
        else:
            sym2 = jnp.where(pad_mask, off[0], sym2)
            idx2 = jnp.where(pad_mask, 0, idx2)
    if cyc:
        v = sym2 - off_lane[None, :]
        maxv = maxv_lane[None, :]
    else:
        v = sym2 - off[idx2]
        maxv = cdf_len[idx2] - 2                 # escape slot excluded
    ok = jnp.all((v >= 0) & (v < maxv))
    vc = jnp.clip(v, 0, maxv - 1)
    if cyc and _use_pallas(backend, cdf.shape[1], lanes, 0, steps,
                           mode='encode_aligned' if aligned else 'encode',
                           cyc=cyc, batch=batch_hint,
                           emit_masks=aligned and want_masks):
        interpret = backend == 'pallas-interpret'
        if aligned:
            from .pallas_kernel import pallas_cyclic_encode_aligned
            outs = pallas_cyclic_encode_aligned(
                cdf_lane, vc, steps, emit_masks=want_masks,
                interpret=interpret)
            streams, lengths, x_final = outs[:3]
            nbytes = 4 + 6 * lanes + 2 * jnp.sum(lengths)
            out = {'streams': streams, 'lengths': lengths,
                   'states': x_final, 'ok': ok,
                   'nbytes': nbytes.astype(jnp.int32), 'n_symbols': n}
            if want_masks:
                out['masks'] = outs[3]
            return out
        from .pallas_kernel import pallas_cyclic_encode
        streams, lengths, x_final = pallas_cyclic_encode(
            cdf_lane, vc, steps, interpret=interpret)
        nbytes = 4 + 2 * lanes + 4 * lanes + 2 * jnp.sum(lengths)
        return {'streams': streams, 'lengths': lengths,
                'states': x_final, 'ok': ok,
                'nbytes': nbytes.astype(jnp.int32), 'n_symbols': n}
    if cyc:
        # gather-free start/freq: fused onehot-reduce against the fixed
        # per-lane row (XLA fuses compare*row-sum; no (L,N,cols) buffer)
        col = jnp.arange(cdf.shape[1], dtype=jnp.int32)
        hit = vc[:, :, None] == col[None, None, :]
        hit1 = vc[:, :, None] + 1 == col[None, None, :]
        start = jnp.sum(jnp.where(hit, cdf_lane[None], 0),
                        axis=2).astype(jnp.uint32)
        nxt = jnp.sum(jnp.where(hit1, cdf_lane[None], 0),
                      axis=2).astype(jnp.uint32)
        freq = nxt - start
    else:
        start = cdf[idx2, vc].astype(jnp.uint32)
        freq = (cdf[idx2, vc + 1] - cdf[idx2, vc]).astype(jnp.uint32)

    def step(x, sf):
        st, fr = sf
        renorm = x >= (fr << 16)
        chunk = (x & _MASK16).astype(jnp.uint16)
        x = jnp.where(renorm, x >> 16, x)
        # exact x // fr without integer division (TPU int div is slow):
        # f32 quotient has absolute error << 1 here (q < 2^16, 24-bit
        # mantissa), so one +-1 integer correction makes it exact.
        q = (x.astype(jnp.float32) / fr.astype(jnp.float32)) \
            .astype(jnp.uint32)
        r = x - q * fr
        too_big = r >= fr            # unsigned wrap when q overshoots
        q = jnp.where(too_big, q - 1, q)
        r = jnp.where(too_big, r + fr, r)
        still_big = r >= fr
        q = jnp.where(still_big, q + 2, q)   # undershoot by one
        r = jnp.where(still_big, r - 2 * fr, r)
        x = (q << PRECISION) + r + st
        return x, (chunk, renorm)

    x0 = jnp.full((lanes,), RANS_L, jnp.uint32)
    # rANS encodes in reverse symbol order; scan the flipped blocks
    x_final, (chunks, masks) = jax.lax.scan(
        step, x0, (jnp.flip(start, 0), jnp.flip(freq, 0)))
    # decoder reads in forward symbol order -> flip emissions back
    chunks = jnp.flip(chunks, 0)                 # (L, N), decode order
    masks = jnp.flip(masks, 0)
    if aligned:
        streams = jnp.where(masks, chunks, 0).T           # (N, L)
        lengths = jnp.sum(masks, axis=0).astype(jnp.int32)
        nbytes = 4 + 6 * lanes + 2 * jnp.sum(lengths)
        out = {'streams': streams, 'lengths': lengths, 'states': x_final,
               'ok': ok, 'nbytes': nbytes.astype(jnp.int32),
               'n_symbols': n}
        if want_masks:
            out['masks'] = masks.T
        return out
    return _finish_encode(chunks, masks, x_final, ok, lanes, n)


def _finish_encode(chunks, masks, x_final, ok, lanes, n):
    """Compact each lane's emitted chunks to the front of its row
    (stable order) and assemble the encode result dict."""
    order = jnp.argsort(~masks, axis=0, stable=True)      # True-first
    streams = jnp.take_along_axis(
        jnp.where(masks, chunks, 0), order, axis=0).T     # (N, L)
    lengths = jnp.sum(masks, axis=0).astype(jnp.int32)    # (N,)
    nbytes = 4 + 2 * lanes + 4 * lanes + 2 * jnp.sum(lengths)
    return {'streams': streams, 'lengths': lengths, 'states': x_final,
            'ok': ok, 'nbytes': nbytes.astype(jnp.int32),
            'n_symbols': n}


def device_rans_decode(streams, states, indexes, quantized_cdf, cdf_length,
                       offset, n_symbols: int, num_lanes: int = 256,
                       cyclic_channels: int | None = None,
                       backend: str = 'auto', batch_hint: int = 1,
                       aligned: bool = False):
    """Decode (N, L) uint16 `streams` + (N,) uint32 `states` back into the
    flat symbol array. `indexes` must match the encoder's. Jittable.
    `cyclic_channels=C` with C | num_lanes enables the gather-free
    fixed-lane-CDF fast path (the per-step row gather dominates the
    general path on TPU). `aligned=True` consumes the TIME-ALIGNED
    layout (`device_rans_encode(aligned=True)`): the chunk for step t is
    at streams[:, t], so the per-lane read pointer disappears.

    `backend`: 'auto' (VMEM-resident Pallas kernel on TPU when the
    cyclic layout applies, the working set fits, and a per-shape timing
    autotune measures it faster — else the XLA scan), 'xla', 'pallas'
    (force compiled kernel),
    'pallas-interpret' (kernel in interpret mode, for CPU tests). The
    SC2_RANS_BACKEND env var overrides 'auto'."""
    backend = _resolve_backend(backend)
    cdf = jnp.asarray(quantized_cdf, jnp.int32)
    cdf_len = jnp.asarray(cdf_length, jnp.int32)
    off = jnp.asarray(offset, jnp.int32)
    _, idx2, n, _ = _blocks(jnp.zeros((n_symbols,), jnp.int32),
                            jnp.asarray(indexes, jnp.int32), num_lanes)
    steps, lanes = idx2.shape
    cyc = int(cyclic_channels) if cyclic_channels else 0
    if cyc and lanes % cyc != 0:
        cyc = 0
    if aligned and int(jnp.asarray(streams).shape[-1]) < steps:
        raise ValueError(
            f'aligned decode needs stream width >= steps ({steps}); got '
            f'{int(jnp.asarray(streams).shape[-1])} — compacted wire?')
    if cyc and _use_pallas(backend, cdf.shape[1], lanes,
                           jnp.asarray(streams).shape[-1], steps,
                           mode='decode_aligned' if aligned else 'decode',
                           cyc=cyc, batch=batch_hint):
        interpret = backend == 'pallas-interpret'
        if aligned:
            from .pallas_kernel import pallas_cyclic_decode_aligned
            return pallas_cyclic_decode_aligned(
                streams, states, cdf, cdf_len, off, n_symbols, lanes,
                cyc, interpret=interpret)
        from .pallas_kernel import pallas_cyclic_decode
        return pallas_cyclic_decode(
            streams, states, cdf, cdf_len, off, n_symbols, lanes, cyc,
            interpret=interpret)
    if idx2.shape[0] * lanes != n_symbols and not cyc:  # padded tail
        lane_pos = jnp.arange(lanes)
        pad_mask = (jnp.arange(steps)[:, None] * lanes + lane_pos) \
            >= n_symbols
        idx2 = jnp.where(pad_mask, 0, idx2)
    max_cols = cdf.shape[1]
    col = jnp.arange(max_cols)
    streams = jnp.asarray(streams, jnp.uint16)
    if cyc:
        lane_ch = jnp.arange(lanes, dtype=jnp.int32) % cyc
        cdf_lane = cdf[lane_ch]                 # (N, cols), built once
        off_lane = off[lane_ch]
        len_lane = cdf_len[lane_ch]

    def symbol_and_next_state(x, idx_t):
        """Shared per-step symbol search + state update (pre-renorm)."""
        slot = (x & _MASK16).astype(jnp.int32)
        if cyc:
            rows = cdf_lane                     # constant inside the scan
            within = (rows <= slot[:, None]) \
                & (col[None, :] < len_lane[:, None])
            v = jnp.sum(within, axis=1).astype(jnp.int32) - 1
            hit = v[:, None] == col[None, :]
            hit1 = v[:, None] + 1 == col[None, :]
            st = jnp.sum(jnp.where(hit, rows, 0), axis=1) \
                .astype(jnp.uint32)
            fr = jnp.sum(jnp.where(hit1, rows, 0), axis=1) \
                .astype(jnp.uint32) - st
            sym_off = off_lane
        else:
            v = cdf_bisect(cdf, cdf_len, idx_t, slot)
            st = cdf[idx_t, v].astype(jnp.uint32)
            fr = (cdf[idx_t, v + 1] - cdf[idx_t, v]).astype(jnp.uint32)
            sym_off = off[idx_t]
        x = fr * (x >> 16) + slot.astype(jnp.uint32) - st
        return x, v + sym_off

    if aligned:
        # chunk for step t is streams[:, t] — consume it iff x < RANS_L
        rows_t = streams[:, :steps].T.astype(jnp.uint32)  # (L, N)

        def step_a(x, inp):
            idx_t, chunk_t = inp
            x, sym = symbol_and_next_state(x, idx_t)
            need = x < RANS_L
            x = jnp.where(need, (x << 16) | chunk_t, x)
            return x, sym

        x_end, out = jax.lax.scan(step_a, jnp.asarray(states, jnp.uint32),
                                  (idx2, rows_t))
        valid = jnp.all(x_end == RANS_L)
        return out.reshape(-1)[:n_symbols], valid

    def step(carry, idx_t):
        x, ptr = carry
        x, sym = symbol_and_next_state(x, idx_t)
        need = x < RANS_L
        nxt = jnp.take_along_axis(
            streams, jnp.clip(ptr, 0, streams.shape[1] - 1)[:, None],
            axis=1)[:, 0].astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | nxt, x)
        ptr = ptr + need.astype(jnp.int32)
        return (x, ptr), sym

    x0 = jnp.asarray(states, jnp.uint32)
    ptr0 = jnp.zeros((lanes,), jnp.int32)
    (x_end, _), out = jax.lax.scan(step, (x0, ptr0), idx2)
    # integrity: a well-formed stream returns every lane to RANS_L
    valid = jnp.all(x_end == RANS_L)
    return out.reshape(-1)[:n_symbols], valid


# ---------------------------------------------------------------------------
# Host packing of the wire format (exact nbytes as reported by encode)
# ---------------------------------------------------------------------------

def pack_stream(encoded: dict) -> bytes:
    """[u16 num_lanes][u16 reserved][N u16 lengths][N u32 states]
    [concat per-lane u16 chunks] — little endian."""
    streams = np.asarray(encoded['streams'])
    lengths = np.asarray(encoded['lengths'])
    states = np.asarray(encoded['states'])
    lanes = streams.shape[0]
    if lengths.size and int(lengths.max()) > 0xFFFF:
        raise ValueError(
            f'lane stream length {int(lengths.max())} exceeds the u16 '
            'wire header; raise num_lanes (auto_lanes targets ~256 '
            'steps/lane, far below the 65535 limit)')
    head = np.asarray([lanes, 0], np.uint16).tobytes()
    body = [head, lengths.astype(np.uint16).tobytes(),
            states.astype(np.uint32).tobytes()]
    for j in range(lanes):
        body.append(streams[j, :lengths[j]].astype(np.uint16).tobytes())
    return b''.join(body)


def pack_stream_aligned(encoded: dict) -> bytes:
    """Pack an `aligned=True, want_masks=True` encode result into the
    SAME wire bytes as `pack_stream` on the compacted layout: per lane,
    the real chunks (mask-selected) appear in time order, which IS the
    compacted decode order."""
    streams = np.asarray(encoded['streams'])
    masks = np.asarray(encoded['masks']).astype(bool)
    lengths = np.asarray(encoded['lengths'])
    states = np.asarray(encoded['states'])
    lanes = streams.shape[0]
    if lengths.size and int(lengths.max()) > 0xFFFF:
        raise ValueError('lane stream length exceeds the u16 wire header')
    head = np.asarray([lanes, 0], np.uint16).tobytes()
    body = [head, lengths.astype(np.uint16).tobytes(),
            states.astype(np.uint32).tobytes()]
    for j in range(lanes):
        body.append(streams[j][masks[j]].astype(np.uint16).tobytes())
    return b''.join(body)


def wire_nbytes(data: bytes) -> int:
    """Size of the (self-describing) lane wire at the head of `data`."""
    lanes = int(np.frombuffer(data[:2], np.uint16)[0])
    lengths = np.frombuffer(data[4:4 + 2 * lanes], np.uint16)
    return 4 + 6 * lanes + 2 * int(lengths.sum())


def split_wire(data: bytes):
    """Split a concatenation of two lane wires (the hyperprior
    `pull_wire` layout: z wire then y wire) into its parts."""
    k = wire_nbytes(data)
    return data[:k], data[k:]


def unpack_stream(data: bytes):
    """-> (streams (N, Lmax) uint16 zero-padded, states (N,) uint32)."""
    lanes = int(np.frombuffer(data[:2], np.uint16)[0])
    o = 4
    lengths = np.frombuffer(data[o:o + 2 * lanes], np.uint16).astype(np.int64)
    o += 2 * lanes
    states = np.frombuffer(data[o:o + 4 * lanes], np.uint32).copy()
    o += 4 * lanes
    lmax = int(lengths.max()) if lanes else 0
    streams = np.zeros((lanes, max(lmax, 1)), np.uint16)
    for j in range(lanes):
        k = int(lengths[j])
        streams[j, :k] = np.frombuffer(data[o:o + 2 * k], np.uint16)
        o += 2 * k
    return streams, states


# ---------------------------------------------------------------------------
# Numpy oracle: pins the lane format independently of XLA
# ---------------------------------------------------------------------------

def numpy_oracle_encode(symbols, indexes, cdf, cdf_length, offset,
                        num_lanes=256, cyclic_channels=None):
    """`cyclic_channels=C` replicates the fixed-lane-channel pad rule
    (pad symbol = v=0 of the pad position's OWN channel) so the oracle
    pins both format variants."""
    symbols = np.asarray(symbols, np.int64)
    indexes = np.asarray(indexes, np.int64)
    n = len(symbols)
    steps = -(-n // num_lanes)
    pad = steps * num_lanes - n
    if pad:
        if cyclic_channels and num_lanes % int(cyclic_channels) == 0:
            pad_idx = (np.arange(n, n + pad) % int(cyclic_channels))
        else:
            pad_idx = np.zeros(pad, np.int64)
        symbols = np.concatenate(
            [symbols, np.asarray(offset)[pad_idx].astype(np.int64)])
        indexes = np.concatenate([indexes, pad_idx.astype(np.int64)])
    sym2 = symbols.reshape(steps, num_lanes)
    idx2 = indexes.reshape(steps, num_lanes)
    x = np.full(num_lanes, int(RANS_L), np.uint64)
    streams = [[] for _ in range(num_lanes)]
    for t in range(steps - 1, -1, -1):
        v = sym2[t] - np.asarray(offset)[idx2[t]]
        assert np.all((v >= 0) & (v < np.asarray(cdf_length)[idx2[t]] - 2))
        st = np.asarray(cdf)[idx2[t], v].astype(np.uint64)
        fr = (np.asarray(cdf)[idx2[t], v + 1]
              - np.asarray(cdf)[idx2[t], v]).astype(np.uint64)
        renorm = x >= (fr << 16)
        for j in np.nonzero(renorm)[0]:
            streams[j].append(int(x[j] & 0xFFFF))
            x[j] >>= 16
        x = ((x // fr) << PRECISION) + (x % fr) + st
    # decode order = reverse emission order per lane
    streams = [list(reversed(s)) for s in streams]
    return streams, x.astype(np.uint32)


def numpy_oracle_decode(streams, states, indexes, cdf, cdf_length, offset,
                        n_symbols, num_lanes=256):
    indexes = np.asarray(indexes, np.int64)
    steps = -(-n_symbols // num_lanes)
    pad = steps * num_lanes - n_symbols
    if pad:
        indexes = np.concatenate([indexes, np.zeros(pad, np.int64)])
    idx2 = indexes.reshape(steps, num_lanes)
    x = np.asarray(states, np.uint64).copy()
    ptr = np.zeros(num_lanes, np.int64)
    out = np.zeros((steps, num_lanes), np.int64)
    cdf = np.asarray(cdf)
    for t in range(steps):
        for j in range(num_lanes):
            slot = int(x[j] & 0xFFFF)
            row = cdf[idx2[t, j]][:int(np.asarray(cdf_length)[idx2[t, j]])]
            v = int(np.searchsorted(row, slot, side='right')) - 1
            st, fr = int(row[v]), int(row[v + 1] - row[v])
            x[j] = fr * (x[j] >> 16) + slot - st
            if x[j] < int(RANS_L):
                x[j] = (x[j] << 16) | streams[j][int(ptr[j])]
                ptr[j] += 1
            out[t, j] = v + int(np.asarray(offset)[idx2[t, j]])
    assert np.all(x == int(RANS_L)), 'corrupt stream'
    return out.reshape(-1)[:n_symbols]
