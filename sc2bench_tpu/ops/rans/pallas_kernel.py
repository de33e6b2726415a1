"""Pallas TPU kernel for the cyclic-lane rANS decode scan.

The device-wire decode (`device.py:device_rans_decode`) is a `lax.scan`
whose per-step work is three masked reductions over the per-lane CDF
plus a one-hot stream-chunk read. XLA lowers each step to several
full-size HBM-roundtrip ops; this kernel keeps the CDF table, the
renorm streams, the lane states and the output block resident in VMEM
for the whole scan, so each step is pure VPU work on registers/VMEM.
Measured on v5e: decode 1.15-1.77x the XLA scan at the flagship
55x55x24 deploy shape per image, 27x at wire_batch=32 (the vmapped XLA
scan collapses; 92 -> 1.8 ms); encode wins ~6x batched since the r4
kernel compacts streams in-VMEM instead of XLA's argsort (see
docs/performance.md). The `auto` gate autotunes per shape so each
kernel is only used where it measures faster.

Gather-free by construction (Mosaic's `dynamic_gather` only supports a
single (8, 128) tile on this toolchain — mapped empirically):
  - symbol search: prefix mask `m = cdf <= slot` over the lane-expanded
    transposed CDF, then count/max/min reductions give v, cdf[v],
    cdf[v+1] without indexing;
  - stream read: one-hot `row_iota == ptr` against the time-major
    stream block.

Only the *cyclic* lane layout is supported (lane j always codes channel
j % C — the deploy fast path, `device.py:auto_lanes(cyclic_channels=)`);
the general per-symbol-index path stays on the XLA scan.

Reference placement note: the reference entropy-decodes serially on the
host via CompressAI's C++ coder (`/root/reference/sc2bench/models/
layer.py:520`); this kernel is the TPU-native replacement on the
serving path.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sentinel for CDF rows beyond a lane's table length: larger than any
# 16-bit slot, so masked compares never select padding.
_BIG = np.int32(1 << 20)
_RANS_L = np.uint32(1 << 16)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_kernel(cdf_ref, streams_ref, states_ref, out_ref, xend_ref,
                   *, steps: int):
    """One grid step decodes all `steps` symbols of every lane.

    cdf_ref     (cols_p, N) int32 — transposed lane-expanded CDF,
                padded with _BIG beyond each lane's cdf_length
    streams_ref (lmax_p, N) int32 — time-major renorm chunks
    states_ref  (1, N) uint32     — per-lane initial decoder states
    out_ref     (steps_p, N) int32 — decoded v (no offset applied)
    xend_ref    (1, N) uint32     — final states (validity check)
    """
    cdf = cdf_ref[:]
    streams = streams_ref[:]
    lmax_p = streams.shape[0]
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (lmax_p, streams.shape[1]), 0)

    def body(t, carry):
        x, ptr = carry                                   # (1, N)
        slot = (x & 0xFFFF).astype(jnp.int32)
        m = cdf <= slot                                  # (cols_p, N)
        v = jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True) - 1
        st = jnp.max(jnp.where(m, cdf, 0), axis=0, keepdims=True)
        nxt = jnp.min(jnp.where(m, _BIG, cdf), axis=0, keepdims=True)
        fr = (nxt - st).astype(jnp.uint32)
        x = fr * (x >> 16) + slot.astype(jnp.uint32) - st.astype(jnp.uint32)
        need = x < _RANS_L
        hit = row_iota == ptr
        chunk = jnp.sum(jnp.where(hit, streams, 0), axis=0,
                        keepdims=True).astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | chunk, x)
        ptr = ptr + need.astype(jnp.int32)
        out_ref[pl.ds(t, 1), :] = v
        return x, ptr

    x, _ = jax.lax.fori_loop(
        0, steps, body,
        (states_ref[:], jnp.zeros_like(out_ref[0:1, :])))
    xend_ref[:] = x


def _decode_kernel_aligned(cdf_ref, streams_ref, states_ref, out_ref,
                           xend_ref, *, steps: int):
    """Aligned-layout decode: the renorm chunk consumed at forward step t
    sits at ROW t of the time-major stream block (rANS encode emissions
    and decode consumptions are symmetric per symbol position — see
    `device.py` "aligned" notes), so the per-step one-hot stream search
    of `_decode_kernel` disappears entirely: each step is three masked
    CDF reductions plus a direct row read.

    cdf_ref     (cols_p, N) int32 — transposed lane-expanded CDF
    streams_ref (steps_p, N) int32 — ALIGNED chunks: row t holds the
                chunk consumed at step t (0 where none is consumed)
    states_ref  (1, N) uint32
    out_ref     (steps_p, N) int32 — decoded v (no offset applied)
    xend_ref    (1, N) uint32
    """
    cdf = cdf_ref[:]

    def body(t, x):
        slot = (x & 0xFFFF).astype(jnp.int32)
        m = cdf <= slot                                  # (cols_p, N)
        v = jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True) - 1
        st = jnp.max(jnp.where(m, cdf, 0), axis=0, keepdims=True)
        nxt = jnp.min(jnp.where(m, _BIG, cdf), axis=0, keepdims=True)
        fr = (nxt - st).astype(jnp.uint32)
        x = fr * (x >> 16) + slot.astype(jnp.uint32) - st.astype(jnp.uint32)
        need = x < _RANS_L
        chunk = streams_ref[pl.ds(t, 1), :].astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | chunk, x)
        out_ref[pl.ds(t, 1), :] = v
        return x

    xend_ref[:] = jax.lax.fori_loop(0, steps, body, states_ref[:])


def _encode_kernel_aligned(cdf_ref, vc_ref, streams_ref, lengths_ref,
                           xend_ref, *rest, steps: int,
                           emit_masks: bool):
    """Aligned-layout encode: phase 1 of `_encode_kernel` only — each
    reverse step writes its (masked) chunk straight to ROW t of the
    output block, so the O(steps^2) in-VMEM compaction phase is gone.
    `lengths` (= emitted chunks per lane, for exact byte accounting)
    accumulate in the loop carry. With `emit_masks` the renorm mask is
    also written out (hosts compact a real wire from it; the fused
    device->device path skips it)."""
    masks_ref = rest[0] if emit_masks else None
    cdf = cdf_ref[:]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, cdf.shape, 0)

    def body(i, carry):
        x, cnt = carry
        t = steps - 1 - i                     # encode in reverse order
        vc = vc_ref[pl.ds(t, 1), :]           # (1, N)
        h0 = col_iota == vc
        h1 = col_iota == vc + 1
        st = jnp.sum(jnp.where(h0, cdf, 0), axis=0,
                     keepdims=True).astype(jnp.uint32)
        nxt = jnp.sum(jnp.where(h1, cdf, 0), axis=0,
                      keepdims=True).astype(jnp.uint32)
        fr = nxt - st
        renorm = x >= (fr << 16)
        chunk = (x & 0xFFFF).astype(jnp.int32)
        x = jnp.where(renorm, x >> 16, x)
        # exact x // fr via f32 + correction (see `_encode_kernel`)
        as_f32 = lambda u: u.astype(jnp.int32).astype(jnp.float32)  # noqa: E731
        xf = as_f32(x >> 16) * 65536.0 + as_f32(x & 0xFFFF)
        q = (xf / as_f32(fr)).astype(jnp.int32).astype(jnp.uint32)
        r = x - q * fr
        too_big = r >= fr
        q = jnp.where(too_big, q - 1, q)
        r = jnp.where(too_big, r + fr, r)
        still_big = r >= fr
        q = jnp.where(still_big, q + 2, q)
        r = jnp.where(still_big, r - 2 * fr, r)
        x = (q << 16) + r + st
        mk = renorm.astype(jnp.int32)
        streams_ref[pl.ds(t, 1), :] = jnp.where(renorm, chunk, 0)
        if emit_masks:
            masks_ref[pl.ds(t, 1), :] = mk
        return x, cnt + mk

    n = cdf.shape[1]
    x0 = jnp.full((1, n), _RANS_L, jnp.uint32)
    cnt0 = jnp.zeros((1, n), jnp.int32)
    xend, cnt = jax.lax.fori_loop(0, steps, body, (x0, cnt0))
    xend_ref[:] = xend
    lengths_ref[:] = cnt


def vmem_bytes_estimate(cols: int, lanes: int, lmax: int,
                        steps: int) -> int:
    """Working-set estimate used by the auto backend gate."""
    cols_p = _round_up(cols, 8)
    lmax_p = _round_up(max(lmax, 8), 8)
    steps_p = _round_up(steps, 8)
    # cdf + streams + out, all int32, plus the (cols_p, N) mask live
    return 4 * lanes * (2 * cols_p + lmax_p + steps_p)


# XLA:TPU places an UNBATCHED Mosaic custom call's full operand/result
# arrays in scoped VMEM (observed on this toolchain: 'Scoped allocation
# ... exceeded scoped vmem limit' at 16M for a 3072-lane encode). Refuse
# the kernel when the call's total array bytes approach that stack
# limit — the XLA scan handles those shapes (and is competitive there
# anyway). Under vmap (wire_batch) the batch dim becomes a Mosaic grid
# dim and the batched operands stay in HBM — measured on v5e: an 8-wide
# vmap of a 7 MB decode call (56 MB of batched operands) compiles and
# runs — so the estimate is correctly per-call, not times the batch.
_SCOPED_VMEM_CALL_LIMIT = 14 << 20


def _full_call_bytes_encode(cols: int, lanes: int, steps: int) -> int:
    lanes_p = _round_up(lanes, 128)
    return 4 * lanes_p * (_round_up(cols, 8) + 2 * _round_up(steps, 8) + 1)


def _full_call_bytes_decode(cols: int, lanes: int, lmax: int,
                            steps: int) -> int:
    lanes_p = _round_up(lanes, 128)
    return 4 * lanes_p * (_round_up(cols, 8) + _round_up(max(lmax, 8), 8)
                          + _round_up(steps, 8) + 2)


def _lane_blocks(lanes: int):
    """Candidate lane blocks for the PADDED lane count (a multiple of
    128), largest first: 128*d for every divisor d of lanes_p/128. The
    kernel pads non-multiple lane counts with inert lanes (see
    `_pad_lanes_*`), so any `lanes` is admissible."""
    m = _round_up(lanes, 128) // 128
    return [128 * d for d in range(m, 0, -1) if m % d == 0]


def pick_lane_block(cols: int, lanes: int, lmax: int, steps: int,
                    vmem_limit: int = 10 << 20) -> int | None:
    """Largest lane block (multiple of 128 dividing the padded lane
    count) whose working set fits a v5e core's VMEM; None if the kernel
    doesn't apply. Lanes decode independently, so blocking the lane dim
    over a grid is exact."""
    for b in _lane_blocks(lanes):
        if vmem_bytes_estimate(cols, b, lmax, steps) <= vmem_limit:
            return b
    return None


def _divisors_ascending(m: int):
    return [d for d in range(1, m + 1) if m % d == 0]


def pick_decode_plan(cols: int, lanes: int, lmax: int,
                     steps: int) -> tuple[int, int] | None:
    """(groups, lane_block) for the decode call, or None if no plan
    fits. `groups` > 1 splits the padded lanes into equal contiguous
    sub-calls driven by `jax.vmap`: the batch dim becomes a Mosaic grid
    dim, so the big operands/results stay in HBM instead of the
    scoped-VMEM stack where XLA places an UNBATCHED call's full arrays
    (observed on this toolchain: a 13.3 MB unbatched decode call at the
    800x1344 detection latent OOMs the 16 MB scoped stack; the same
    data as 2 vmapped 6.7 MB sub-calls runs). The stack check charges
    the full arrays only for groups == 1, plus 2x the lane-block
    working set (double-buffered DMA) either way."""
    lanes_p = _round_up(lanes, 128)
    for g in _divisors_ascending(lanes_p // 128):
        ng = lanes_p // g
        stacked = _full_call_bytes_decode(cols, ng, lmax, steps) \
            if g == 1 else 0
        if stacked > _SCOPED_VMEM_CALL_LIMIT:
            continue
        for b in _lane_blocks(ng):
            est = vmem_bytes_estimate(cols, b, lmax, steps)
            if est <= (10 << 20) and \
                    stacked + 2 * est <= _SCOPED_VMEM_CALL_LIMIT:
                return g, b
    return None


def _encode_block_bytes(cols: int, b: int, steps: int) -> int:
    # cdf + vc + streams out + chunks/masks scratch (+1 headroom for the
    # compaction's hit/where temporaries)
    return 4 * b * (2 * _round_up(cols, 8) + 5 * _round_up(steps, 8))


def pick_encode_plan(cols: int, lanes: int,
                     steps: int) -> tuple[int, int] | None:
    """(groups, lane_block) for the encode call, or None — same
    grouped-vmap scheme as `pick_decode_plan`."""
    lanes_p = _round_up(lanes, 128)
    for g in _divisors_ascending(lanes_p // 128):
        ng = lanes_p // g
        stacked = _full_call_bytes_encode(cols, ng, steps) \
            if g == 1 else 0
        if stacked > _SCOPED_VMEM_CALL_LIMIT:
            continue
        for b in _lane_blocks(ng):
            est = _encode_block_bytes(cols, b, steps)
            if est <= (10 << 20) and \
                    stacked + 2 * est <= _SCOPED_VMEM_CALL_LIMIT:
                return g, b
    return None


def _encode_block_bytes_aligned(cols: int, b: int, steps: int,
                                emit_masks: bool) -> int:
    # cdf (+ onehot temp) + vc + aligned streams out (+ masks out)
    return 4 * b * (2 * _round_up(cols, 8)
                    + (3 + int(emit_masks)) * _round_up(steps, 8))


def pick_encode_plan_aligned(cols: int, lanes: int, steps: int,
                             emit_masks: bool = False
                             ) -> tuple[int, int] | None:
    """(groups, lane_block) for the ALIGNED encode call, or None — same
    grouped-vmap scheme as `pick_decode_plan`."""
    lanes_p = _round_up(lanes, 128)
    outs = 4 * lanes_p * ((2 + int(emit_masks)) * _round_up(steps, 8) + 2
                          + _round_up(cols, 8))
    for g in _divisors_ascending(lanes_p // 128):
        ng = lanes_p // g
        stacked = outs if g == 1 else 0
        if stacked > _SCOPED_VMEM_CALL_LIMIT:
            continue
        for b in _lane_blocks(ng):
            est = _encode_block_bytes_aligned(cols, b, steps, emit_masks)
            if est <= (10 << 20) and \
                    stacked + 2 * est <= _SCOPED_VMEM_CALL_LIMIT:
                return g, b
    return None


def _decode_block_bytes_aligned(cols: int, b: int, steps: int) -> int:
    # cdf (+ mask temp) + aligned streams + out block
    return 4 * b * (2 * _round_up(cols, 8) + 2 * _round_up(steps, 8))


def pick_decode_plan_aligned(cols: int, lanes: int,
                             steps: int) -> tuple[int, int] | None:
    """(groups, lane_block) for the ALIGNED decode call, or None."""
    lanes_p = _round_up(lanes, 128)
    full = 4 * lanes_p * (_round_up(cols, 8) + 2 * _round_up(steps, 8) + 2)
    for g in _divisors_ascending(lanes_p // 128):
        ng = lanes_p // g
        stacked = full if g == 1 else 0
        if stacked > _SCOPED_VMEM_CALL_LIMIT:
            continue
        for b in _lane_blocks(ng):
            est = _decode_block_bytes_aligned(cols, b, steps)
            if est <= (10 << 20) and \
                    stacked + 2 * est <= _SCOPED_VMEM_CALL_LIMIT:
                return g, b
    return None


def _grouped(call, g: int, *arrays):
    """Run `call` over `g` equal contiguous lane groups via vmap. Each
    array is (..., N) with the lane dim LAST; outputs likewise."""
    def split(a):
        n = a.shape[-1]
        return jnp.moveaxis(a.reshape(*a.shape[:-1], g, n // g), -2, 0)

    outs = jax.vmap(call)(*[split(a) for a in arrays])
    return tuple(
        jnp.moveaxis(o, 0, -2).reshape(*o.shape[1:-1], -1) for o in outs)


@functools.partial(jax.jit,
                   static_argnames=('steps', 'lane_block', 'interpret'))
def _pallas_decode_call(cdf_t, streams_t, states, steps: int,
                        lane_block: int | None = None,
                        interpret: bool = False):
    """cdf_t (cols, N) int32 BIG-padded per lane; streams_t (L, N) int32
    time-major; states (N,) uint32. Returns (out (steps, N) int32 v's,
    xend (N,) uint32). `lane_block` (a divisor of N) grids the
    independent lanes into VMEM-sized blocks."""
    cols, n = cdf_t.shape
    cols_p = _round_up(cols, 8)
    if cols_p != cols:
        cdf_t = jnp.pad(cdf_t, ((0, cols_p - cols), (0, 0)),
                        constant_values=_BIG)
    lmax_p = _round_up(max(streams_t.shape[0], 8), 8)
    if lmax_p != streams_t.shape[0]:
        streams_t = jnp.pad(
            streams_t, ((0, lmax_p - streams_t.shape[0]), (0, 0)))
    steps_p = _round_up(steps, 8)
    b = n if lane_block is None else int(lane_block)
    grid = (n // b,)
    lane_map = lambda i: (0, i)  # noqa: E731 — block index along lanes
    out, xend = pl.pallas_call(
        functools.partial(_decode_kernel, steps=steps),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((steps_p, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.uint32)),
        in_specs=[
            pl.BlockSpec((cols_p, b), lane_map),
            pl.BlockSpec((lmax_p, b), lane_map),
            pl.BlockSpec((1, b), lane_map),
        ],
        out_specs=(pl.BlockSpec((steps_p, b), lane_map),
                   pl.BlockSpec((1, b), lane_map)),
        interpret=interpret,
    )(cdf_t, streams_t, states[None, :].astype(jnp.uint32))
    return out[:steps], xend[0]


def _encode_kernel(cdf_ref, vc_ref, streams_ref, lengths_ref, xend_ref,
                   chunks_ref, masks_ref, *, steps: int):
    """Encode AND compact all `steps` symbol rows of a lane block in one
    grid step — the full wire-format producer, so no XLA post-pass
    (the scan-only variant left `_finish_encode`'s argsort compaction in
    XLA, which dominated batched encodes ~10:1).

    cdf_ref     (cols_p, N) int32 — transposed lane-expanded CDF
    vc_ref      (steps_p, N) int32 — in-support symbol values (v), forward
                symbol order (the kernel walks them in reverse, as rANS
                encodes last-symbol-first)
    streams_ref (steps_p, N) int32 — per-lane emitted chunks compacted to
                the FRONT of each column in forward (decode) order;
                rows beyond a lane's length are 0
    lengths_ref (1, N) int32      — emitted chunks per lane
    xend_ref    (1, N) uint32     — final encoder states
    chunks/masks_ref — (steps_p, N) int32 VMEM scratch
    """
    cdf = cdf_ref[:]
    cols_p = cdf.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, cdf.shape, 0)

    def body(i, x):
        t = steps - 1 - i                     # encode in reverse order
        vc = vc_ref[pl.ds(t, 1), :]           # (1, N)
        h0 = col_iota == vc
        h1 = col_iota == vc + 1
        st = jnp.sum(jnp.where(h0, cdf, 0), axis=0,
                     keepdims=True).astype(jnp.uint32)
        nxt = jnp.sum(jnp.where(h1, cdf, 0), axis=0,
                      keepdims=True).astype(jnp.uint32)
        fr = nxt - st
        renorm = x >= (fr << 16)
        chunk = (x & 0xFFFF).astype(jnp.int32)
        x = jnp.where(renorm, x >> 16, x)
        # exact x // fr via f32 (q < 2^16 fits the mantissa) + correction.
        # Mosaic on this toolchain can't cast u32->f32 directly; split x
        # into 16-bit halves (each exact in f32 via i32) and recombine —
        # the recombined f32 has the same 2^-24 relative error as a
        # direct u32->f32 cast, which the +-2 correction below absorbs.
        as_f32 = lambda u: u.astype(jnp.int32).astype(jnp.float32)  # noqa: E731
        xf = as_f32(x >> 16) * 65536.0 + as_f32(x & 0xFFFF)
        q = (xf / as_f32(fr)).astype(jnp.int32).astype(jnp.uint32)
        r = x - q * fr
        too_big = r >= fr
        q = jnp.where(too_big, q - 1, q)
        r = jnp.where(too_big, r + fr, r)
        still_big = r >= fr
        q = jnp.where(still_big, q + 2, q)
        r = jnp.where(still_big, r - 2 * fr, r)
        x = (q << 16) + r + st
        chunks_ref[pl.ds(t, 1), :] = chunk
        masks_ref[pl.ds(t, 1), :] = renorm.astype(jnp.int32)
        return x

    n = cdf.shape[1]
    x0 = jnp.full((1, n), _RANS_L, jnp.uint32)
    xend_ref[:] = jax.lax.fori_loop(0, steps, body, x0)

    # phase 2: compact each lane's emitted chunks to the front of its
    # column in forward order (the wire format). One-hot accumulate at a
    # per-lane write pointer — the same gather-free trick the decode
    # kernel uses for its stream reads; all VMEM-resident.
    steps_p = streams_ref.shape[0]
    streams_ref[:] = jnp.zeros((steps_p, n), jnp.int32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (steps_p, n), 0)

    def compact(t, wp):
        ck = chunks_ref[pl.ds(t, 1), :]          # (1, N)
        mk = masks_ref[pl.ds(t, 1), :]           # (1, N)
        hit = (row_iota == wp) & (mk > 0)
        streams_ref[:] = streams_ref[:] + jnp.where(hit, ck, 0)
        return wp + mk

    wp0 = jnp.zeros((1, n), jnp.int32)
    lengths_ref[:] = jax.lax.fori_loop(0, steps, compact, wp0)


def pick_lane_block_encode(cols: int, lanes: int, steps: int,
                           vmem_limit: int = 10 << 20) -> int | None:
    """Encode working set: cdf + vc + chunks + masks (+ mask temps)."""
    cols_p = _round_up(cols, 8)
    steps_p = _round_up(steps, 8)
    per_lane = 4 * (2 * cols_p + 3 * steps_p)
    for b in _lane_blocks(lanes):
        if b * per_lane <= vmem_limit:
            return b
    return None


@functools.partial(jax.jit,
                   static_argnames=('steps', 'lane_block', 'interpret'))
def _pallas_encode_call(cdf_t, vc, steps: int,
                        lane_block: int | None = None,
                        interpret: bool = False):
    """cdf_t (cols, N) int32 (per-lane tables; padding rows are never
    selected because vc is in-support); vc (steps, N) int32 forward
    order. Returns (streams (steps, N) int32 — per-lane compacted
    chunks, forward order, zero beyond each lane's length — lengths
    (N,) int32, xend (N,) uint32)."""
    cols, n = cdf_t.shape
    cols_p = _round_up(cols, 8)
    if cols_p != cols:
        cdf_t = jnp.pad(cdf_t, ((0, cols_p - cols), (0, 0)),
                        constant_values=_BIG)
    steps_p = _round_up(steps, 8)
    if steps_p != vc.shape[0]:
        vc = jnp.pad(vc, ((0, steps_p - vc.shape[0]), (0, 0)))
    b = n if lane_block is None else int(lane_block)
    lane_map = lambda i: (0, i)  # noqa: E731
    streams, lengths, xend = pl.pallas_call(
        functools.partial(_encode_kernel, steps=steps),
        grid=(n // b,),
        out_shape=(jax.ShapeDtypeStruct((steps_p, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.uint32)),
        in_specs=[pl.BlockSpec((cols_p, b), lane_map),
                  pl.BlockSpec((steps_p, b), lane_map)],
        out_specs=(pl.BlockSpec((steps_p, b), lane_map),
                   pl.BlockSpec((1, b), lane_map),
                   pl.BlockSpec((1, b), lane_map)),
        scratch_shapes=[pltpu.VMEM((steps_p, b), jnp.int32),
                        pltpu.VMEM((steps_p, b), jnp.int32)],
        interpret=interpret,
    )(cdf_t, vc)
    return streams[:steps], lengths[0], xend[0]


def _pad_lanes_encode(cdf_lane, vc):
    """Pad the lane dim to a multiple of 128 with INERT encode lanes:
    pad CDF row [0, 65535, 65536, ...] + pad value v=0 gives freq 65535,
    so the pad state never renormalizes (x creeps up by ~1/step, far
    below the 2^32-2^16 renorm threshold for any feasible step count)
    and emits nothing. Pad outputs are sliced away by the caller."""
    lanes = int(vc.shape[1])
    lanes_p = _round_up(lanes, 128)
    if lanes_p == lanes:
        return cdf_lane, vc, lanes
    pad_row = jnp.zeros((lanes_p - lanes, cdf_lane.shape[1]), jnp.int32)
    pad_row = pad_row.at[:, 1].set((1 << 16) - 1)
    pad_row = pad_row.at[:, 2:].set(1 << 16)
    cdf_lane = jnp.concatenate([jnp.asarray(cdf_lane, jnp.int32), pad_row])
    vc = jnp.pad(jnp.asarray(vc, jnp.int32),
                 ((0, 0), (0, lanes_p - lanes)))
    return cdf_lane, vc, lanes


def pallas_cyclic_encode(cdf_lane, vc, steps: int,
                         interpret: bool = False):
    """Kernel wrapper used by `device.py`'s cyclic encode path: takes the
    (N, cols) lane-expanded CDF and forward-order in-support values
    (steps, N); returns the COMPLETE wire triple
    (streams (N, L) uint16 — compacted, forward decode order — lengths
    (N,) int32, states (N,) uint32), byte-identical to the XLA scan +
    `_finish_encode` path. Lane counts that are not multiples of 128 are
    padded with inert lanes inside the kernel call (wire format
    unchanged); inert pad lanes emit nothing and are sliced away."""
    cdf_lane, vc, lanes = _pad_lanes_encode(cdf_lane, vc)
    plan = pick_encode_plan(int(cdf_lane.shape[1]), lanes, steps)
    if plan is None and not interpret:
        # only reachable when the backend is FORCED to 'pallas' (the auto
        # gate consults the same picker first): fail with a clear message
        # instead of an obscure Mosaic tiling/VMEM error
        raise ValueError(
            f'no VMEM-fitting call plan for the Pallas rANS encode '
            f'kernel (lanes={lanes}, steps={steps}); use backend="xla"')
    groups, block = plan if plan is not None else (1, None)
    call = functools.partial(_pallas_encode_call, steps=steps,
                             lane_block=block, interpret=interpret)
    cdf_t = jnp.asarray(cdf_lane, jnp.int32).T
    if groups == 1:
        streams, lengths, xend = call(cdf_t, vc)
    else:
        streams, lengths, xend = _grouped(call, groups, cdf_t, vc)
    return (streams[:, :lanes].astype(jnp.uint16).T,
            lengths[:lanes], xend[:lanes])


def pallas_cyclic_decode(streams, states, quantized_cdf, cdf_length,
                         offset, n_symbols: int, num_lanes: int,
                         cyclic_channels: int, interpret: bool = False):
    """Drop-in for `device_rans_decode`'s cyclic fast path: same wire
    format, bit-identical output. Traceable inside an outer jit.

    streams (N, L) uint16/int32, states (N,) uint32; tables as in
    `device.py`. Returns (flat int32 symbols (n_symbols,), valid bool).
    """
    c = int(cyclic_channels)
    lanes = int(num_lanes)
    steps = -(-int(n_symbols) // lanes)
    cdf = jnp.asarray(quantized_cdf, jnp.int32)
    cdf_len = jnp.asarray(cdf_length, jnp.int32)
    off = jnp.asarray(offset, jnp.int32)
    lane_ch = jnp.arange(lanes, dtype=jnp.int32) % c
    col = jnp.arange(cdf.shape[1], dtype=jnp.int32)
    cdf_lane = jnp.where(col[None, :] < cdf_len[lane_ch][:, None],
                         cdf[lane_ch], _BIG)           # (N, cols)
    streams = jnp.asarray(streams)
    lanes_p = _round_up(lanes, 128)
    states = jnp.asarray(states, jnp.uint32)
    if lanes_p != lanes:
        # inert decode pad lanes: CDF row [0, 65536, BIG...] keeps a
        # RANS_L-initialized state fixed (v=0, freq=2^16, slot=0) and
        # consumes no stream chunks; sliced away below
        pad_row = jnp.full((lanes_p - lanes, cdf_lane.shape[1]), _BIG,
                           jnp.int32)
        pad_row = pad_row.at[:, 0].set(0)
        pad_row = pad_row.at[:, 1].set(1 << 16)
        cdf_lane = jnp.concatenate([cdf_lane, pad_row])
        streams = jnp.pad(streams, ((0, lanes_p - lanes), (0, 0)))
        states = jnp.concatenate(
            [states, jnp.full((lanes_p - lanes,), _RANS_L, jnp.uint32)])
    plan = pick_decode_plan(int(cdf.shape[1]), lanes,
                            int(streams.shape[-1]), steps)
    if plan is None and not interpret:
        raise ValueError(
            f'no VMEM-fitting call plan for the Pallas rANS decode '
            f'kernel (lanes={lanes}, steps={steps}, '
            f'lmax={int(streams.shape[-1])}); use backend="xla"')
    groups, block = plan if plan is not None else (1, None)
    call = functools.partial(_pallas_decode_call, steps=steps,
                             lane_block=block, interpret=interpret)
    cdf_t = cdf_lane.T
    streams_t = streams.astype(jnp.int32).T
    if groups == 1:
        out, xend = call(cdf_t, streams_t, states)
    else:
        out, xend = _grouped(call, groups, cdf_t, streams_t, states)
    valid = jnp.all(xend[:lanes] == _RANS_L)
    flat = (out[:, :lanes] + off[lane_ch][None, :]) \
        .reshape(-1)[:n_symbols]
    return flat, valid


# ---------------------------------------------------------------------------
# Aligned-layout call wrappers (see `device.py` "aligned" notes)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=('steps', 'lane_block', 'emit_masks',
                                    'interpret'))
def _pallas_encode_call_aligned(cdf_t, vc, steps: int,
                                lane_block: int | None = None,
                                emit_masks: bool = False,
                                interpret: bool = False):
    """Aligned variant of `_pallas_encode_call`: returns
    (streams (steps, N) int32 — row t holds step t's chunk or 0 —
    lengths (N,) int32, xend (N,) uint32[, masks (steps, N) int32])."""
    cols, n = cdf_t.shape
    cols_p = _round_up(cols, 8)
    if cols_p != cols:
        cdf_t = jnp.pad(cdf_t, ((0, cols_p - cols), (0, 0)),
                        constant_values=_BIG)
    steps_p = _round_up(steps, 8)
    if steps_p != vc.shape[0]:
        vc = jnp.pad(vc, ((0, steps_p - vc.shape[0]), (0, 0)))
    b = n if lane_block is None else int(lane_block)
    lane_map = lambda i: (0, i)  # noqa: E731
    out_shape = [jax.ShapeDtypeStruct((steps_p, n), jnp.int32),
                 jax.ShapeDtypeStruct((1, n), jnp.int32),
                 jax.ShapeDtypeStruct((1, n), jnp.uint32)]
    out_specs = [pl.BlockSpec((steps_p, b), lane_map),
                 pl.BlockSpec((1, b), lane_map),
                 pl.BlockSpec((1, b), lane_map)]
    if emit_masks:
        out_shape.append(jax.ShapeDtypeStruct((steps_p, n), jnp.int32))
        out_specs.append(pl.BlockSpec((steps_p, b), lane_map))
    outs = pl.pallas_call(
        functools.partial(_encode_kernel_aligned, steps=steps,
                          emit_masks=emit_masks),
        grid=(n // b,),
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec((cols_p, b), lane_map),
                  pl.BlockSpec((steps_p, b), lane_map)],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(cdf_t, vc)
    streams, lengths, xend = outs[0][:steps], outs[1][0], outs[2][0]
    if emit_masks:
        return streams, lengths, xend, outs[3][:steps]
    return streams, lengths, xend


def pallas_cyclic_encode_aligned(cdf_lane, vc, steps: int,
                                 emit_masks: bool = False,
                                 interpret: bool = False):
    """Aligned-wire encode: returns (streams (N, steps) uint16 — column t
    holds the chunk emitted while coding symbol row t, 0 where none —
    lengths (N,) int32, states (N,) uint32[, masks (N, steps) bool]).
    The per-lane chunk SEQUENCES (and hence the packed wire) are
    byte-identical to the compacted `pallas_cyclic_encode`; only the
    in-memory layout differs."""
    cdf_lane, vc, lanes = _pad_lanes_encode(cdf_lane, vc)
    plan = pick_encode_plan_aligned(int(cdf_lane.shape[1]),
                                    int(cdf_lane.shape[0]), steps,
                                    emit_masks)
    if plan is None and not interpret:
        raise ValueError(
            f'no VMEM-fitting call plan for the aligned Pallas rANS '
            f'encode kernel (lanes={lanes}, steps={steps}); use '
            f'backend="xla"')
    groups, block = plan if plan is not None else (1, None)
    call = functools.partial(_pallas_encode_call_aligned, steps=steps,
                             lane_block=block, emit_masks=emit_masks,
                             interpret=interpret)
    cdf_t = jnp.asarray(cdf_lane, jnp.int32).T
    if groups == 1:
        outs = call(cdf_t, vc)
    else:
        outs = _grouped(call, groups, cdf_t, vc)
    streams = outs[0][:, :lanes].astype(jnp.uint16).T
    lengths, xend = outs[1][:lanes], outs[2][:lanes]
    if emit_masks:
        return streams, lengths, xend, outs[3][:, :lanes].astype(bool).T
    return streams, lengths, xend


@functools.partial(jax.jit,
                   static_argnames=('steps', 'lane_block', 'interpret'))
def _pallas_decode_call_aligned(cdf_t, streams_t, states, steps: int,
                                lane_block: int | None = None,
                                interpret: bool = False):
    """Aligned variant of `_pallas_decode_call`: `streams_t` is
    (steps, N) int32 time-major ALIGNED chunks."""
    cols, n = cdf_t.shape
    cols_p = _round_up(cols, 8)
    if cols_p != cols:
        cdf_t = jnp.pad(cdf_t, ((0, cols_p - cols), (0, 0)),
                        constant_values=_BIG)
    steps_p = _round_up(steps, 8)
    if steps_p != streams_t.shape[0]:
        streams_t = jnp.pad(
            streams_t, ((0, steps_p - streams_t.shape[0]), (0, 0)))
    b = n if lane_block is None else int(lane_block)
    lane_map = lambda i: (0, i)  # noqa: E731
    out, xend = pl.pallas_call(
        functools.partial(_decode_kernel_aligned, steps=steps),
        grid=(n // b,),
        out_shape=(jax.ShapeDtypeStruct((steps_p, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.uint32)),
        in_specs=[
            pl.BlockSpec((cols_p, b), lane_map),
            pl.BlockSpec((steps_p, b), lane_map),
            pl.BlockSpec((1, b), lane_map),
        ],
        out_specs=(pl.BlockSpec((steps_p, b), lane_map),
                   pl.BlockSpec((1, b), lane_map)),
        interpret=interpret,
    )(cdf_t, streams_t, states[None, :].astype(jnp.uint32))
    return out[:steps], xend[0]


def pallas_cyclic_decode_aligned(streams, states, quantized_cdf,
                                 cdf_length, offset, n_symbols: int,
                                 num_lanes: int, cyclic_channels: int,
                                 interpret: bool = False):
    """Drop-in for `device_rans_decode(aligned=True)`'s cyclic fast
    path. `streams` is the (N, steps) ALIGNED layout produced by
    `pallas_cyclic_encode_aligned` / the aligned XLA scan."""
    c = int(cyclic_channels)
    lanes = int(num_lanes)
    steps = -(-int(n_symbols) // lanes)
    cdf = jnp.asarray(quantized_cdf, jnp.int32)
    cdf_len = jnp.asarray(cdf_length, jnp.int32)
    off = jnp.asarray(offset, jnp.int32)
    lane_ch = jnp.arange(lanes, dtype=jnp.int32) % c
    col = jnp.arange(cdf.shape[1], dtype=jnp.int32)
    cdf_lane = jnp.where(col[None, :] < cdf_len[lane_ch][:, None],
                         cdf[lane_ch], _BIG)           # (N, cols)
    streams = jnp.asarray(streams)
    if int(streams.shape[-1]) < steps:
        raise ValueError(
            f'aligned decode needs width >= steps ({steps}); got '
            f'{int(streams.shape[-1])} — was this wire compacted?')
    lanes_p = _round_up(lanes, 128)
    states = jnp.asarray(states, jnp.uint32)
    if lanes_p != lanes:
        pad_row = jnp.full((lanes_p - lanes, cdf_lane.shape[1]), _BIG,
                           jnp.int32)
        pad_row = pad_row.at[:, 0].set(0)
        pad_row = pad_row.at[:, 1].set(1 << 16)
        cdf_lane = jnp.concatenate([cdf_lane, pad_row])
        streams = jnp.pad(streams, ((0, lanes_p - lanes), (0, 0)))
        states = jnp.concatenate(
            [states, jnp.full((lanes_p - lanes,), _RANS_L, jnp.uint32)])
    plan = pick_decode_plan_aligned(int(cdf.shape[1]), lanes, steps)
    if plan is None and not interpret:
        raise ValueError(
            f'no VMEM-fitting call plan for the aligned Pallas rANS '
            f'decode kernel (lanes={lanes}, steps={steps}); use '
            f'backend="xla"')
    groups, block = plan if plan is not None else (1, None)
    call = functools.partial(_pallas_decode_call_aligned, steps=steps,
                             lane_block=block, interpret=interpret)
    cdf_t = cdf_lane.T
    streams_t = streams[:, :steps].astype(jnp.int32).T
    if groups == 1:
        out, xend = call(cdf_t, streams_t, states)
    else:
        out, xend = _grouped(call, groups, cdf_t, streams_t, states)
    valid = jnp.all(xend[:lanes] == _RANS_L)
    flat = (out[:, :lanes] + off[lane_ch][None, :]) \
        .reshape(-1)[:n_symbols]
    return flat, valid
