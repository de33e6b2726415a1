"""Host-side rANS coder binding.

Compiles `rans.cpp` with g++ on first use (cached .so) and binds it via
ctypes (pybind11 is not available in this image). A pure-Python reference
implementation of the *same* bitstream format backs environments without a
compiler and serves as the cross-check oracle in tests.

This is the TPU-native placement of the reference's CompressAI C++ rANS
(SURVEY.md §2.2): symbol/index tensors are computed on the TPU; the serial
bitstream stage runs on host.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_PRECISION = 16
_BYPASS_BITS = 4
_MAX_BYPASS = (1 << _BYPASS_BITS) - 1
_RANS_L = 1 << 23

_LIB = None
_LIB_TRIED = False


def _build_library() -> Path | None:
    src = Path(__file__).parent / 'rans.cpp'
    cache_dir = Path(os.environ.get('SC2_TPU_CACHE',
                                    Path.home() / '.cache' / 'sc2bench_tpu'))
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / 'librans.so'
    if so_path.exists() and so_path.stat().st_mtime >= src.stat().st_mtime:
        return so_path
    try:
        with tempfile.TemporaryDirectory() as td:
            tmp_so = Path(td) / 'librans.so'
            subprocess.run(
                ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
                 '-march=native', '-fopenmp', str(src), '-o', str(tmp_so)],
                check=True, capture_output=True)
            os.replace(tmp_so, so_path)
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load_library():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = _build_library()
    if so_path is None:
        return None
    lib = ctypes.CDLL(str(so_path))
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rans_encode_with_indexes.restype = ctypes.c_int
    lib.rans_encode_with_indexes.argtypes = [
        i32p, i32p, ctypes.c_int, i32p, ctypes.c_int, i32p, i32p,
        u8p, ctypes.c_int]
    lib.rans_decode_with_indexes.restype = ctypes.c_int
    lib.rans_decode_with_indexes.argtypes = [
        u8p, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, i32p]
    lib.rans_encode_interleaved.restype = ctypes.c_int
    lib.rans_encode_interleaved.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, u8p, ctypes.c_int]
    lib.rans_decode_interleaved.restype = ctypes.c_int
    lib.rans_decode_interleaved.argtypes = [
        u8p, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, i32p]
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.rans_decode_with_indexes_coarse.restype = ctypes.c_int
    lib.rans_decode_with_indexes_coarse.argtypes = [
        u8p, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, i16p, ctypes.c_int, i32p]
    lib.rans_encode_cyclic_i16.restype = ctypes.c_int
    lib.rans_encode_cyclic_i16.argtypes = [
        i16p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, i32p, i32p,
        u8p, ctypes.c_int]
    lib.rans_decode_cyclic_i16_coarse.restype = ctypes.c_int
    lib.rans_decode_cyclic_i16_coarse.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, i16p, ctypes.c_int, i16p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.rans_stream_init.restype = None
    lib.rans_stream_init.argtypes = [u8p, ctypes.c_int, i64p]
    lib.rans_stream_decode.restype = ctypes.c_int
    lib.rans_stream_decode.argtypes = [
        u8p, ctypes.c_int, i64p, i32p, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, i32p]
    lib.rans_encode_with_indexes_i16.restype = ctypes.c_int
    lib.rans_encode_with_indexes_i16.argtypes = [
        i16p, i16p, ctypes.c_int, i32p, ctypes.c_int, i32p, i32p,
        u8p, ctypes.c_int]
    lib.rans_decode_with_indexes_i16_coarse.restype = ctypes.c_int
    lib.rans_decode_with_indexes_i16_coarse.argtypes = [
        u8p, ctypes.c_int, i16p, ctypes.c_int, i32p, ctypes.c_int,
        i32p, i32p, i16p, ctypes.c_int, i16p]
    _LIB = lib
    return lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# Pure-Python reference codec (same bitstream format as rans.cpp).
# ---------------------------------------------------------------------------

def _py_encode(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    ops = []
    for sym, idx in zip(symbols.tolist(), indexes.tolist()):
        cdf = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        value = sym - int(offsets[idx])
        raw_val = None
        if value < 0:
            raw_val, value = -2 * value - 1, max_value
        elif value >= max_value:
            raw_val, value = 2 * (value - max_value), max_value
        ops.append((int(cdf[value]), int(cdf[value + 1] - cdf[value])))
        if raw_val is not None:
            bfreq = 1 << (_PRECISION - _BYPASS_BITS)
            n_bypass = 0
            while (raw_val >> (n_bypass * _BYPASS_BITS)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= _MAX_BYPASS:
                ops.append((_MAX_BYPASS << (_PRECISION - _BYPASS_BITS), bfreq))
                val -= _MAX_BYPASS
            ops.append((val << (_PRECISION - _BYPASS_BITS), bfreq))
            for j in range(n_bypass):
                chunk = (raw_val >> (j * _BYPASS_BITS)) & _MAX_BYPASS
                ops.append((chunk << (_PRECISION - _BYPASS_BITS), bfreq))

    x = _RANS_L
    buf = bytearray()
    for start, freq in reversed(ops):
        x_max = ((_RANS_L >> _PRECISION) << 8) * freq
        while x >= x_max:
            buf.append(x & 0xff)
            x >>= 8
        x = ((x // freq) << _PRECISION) + (x % freq) + start
    for _ in range(4):
        buf.append(x & 0xff)
        x >>= 8
    return bytes(reversed(buf))


def _py_decode(data: bytes, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    pos = 0
    x = 0
    for _ in range(4):
        x = (x << 8) | (data[pos] if pos < len(data) else 0)
        pos += 1

    mask = (1 << _PRECISION) - 1

    def advance(start, freq):
        nonlocal x, pos
        x = freq * (x >> _PRECISION) + (x & mask) - start
        while x < _RANS_L:
            x = (x << 8) | (data[pos] if pos < len(data) else 0)
            pos += 1

    def get_bypass():
        val = (x & mask) >> (_PRECISION - _BYPASS_BITS)
        advance(val << (_PRECISION - _BYPASS_BITS),
                1 << (_PRECISION - _BYPASS_BITS))
        return val

    out = np.empty(len(indexes), np.int32)
    for i, idx in enumerate(indexes.tolist()):
        cdf = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        slot = x & mask
        s = int(np.searchsorted(cdf[:int(cdf_lengths[idx])], slot, 'right')) - 1
        advance(int(cdf[s]), int(cdf[s + 1] - cdf[s]))
        value = s
        if s == max_value:
            n_bypass = 0
            while True:
                val = get_bypass()
                n_bypass += val
                if val != _MAX_BYPASS:
                    break
            raw_val = 0
            for j in range(n_bypass):
                raw_val |= get_bypass() << (j * _BYPASS_BITS)
            value = (-(raw_val + 1) // 2 if raw_val & 1
                     else raw_val // 2 + max_value)
        out[i] = value + int(offsets[idx])
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

class RansCoder:
    """Range coder bound to one set of coding tables."""

    def __init__(self, quantized_cdf: np.ndarray, cdf_length: np.ndarray,
                 offset: np.ndarray, use_cpp: bool | None = None):
        self.cdfs = _as_i32(quantized_cdf)
        self.cdf_lengths = _as_i32(cdf_length)
        self.offsets = _as_i32(offset)
        self.cdf_stride = self.cdfs.shape[1]
        if use_cpp is None:
            use_cpp = _load_library() is not None
        self.lib = _load_library() if use_cpp else None
        self._coarse = None
        import threading
        self._init_lock = threading.Lock()

    def encode_with_indexes(self, symbols, indexes) -> bytes:
        symbols = _as_i32(symbols).ravel()
        indexes = _as_i32(indexes).ravel()
        assert symbols.shape == indexes.shape
        if self.lib is None:
            return _py_encode(symbols, indexes, self.cdfs, self.cdf_lengths,
                              self.offsets)
        capacity = max(1024, symbols.size * 8)
        while True:
            out = np.empty(capacity, np.uint8)
            n = self.lib.rans_encode_with_indexes(
                _i32p(symbols), _i32p(indexes), symbols.size,
                _i32p(self.cdfs), self.cdf_stride, _i32p(self.cdf_lengths),
                _i32p(self.offsets), _u8p(out), capacity)
            if n >= 0:
                return out[:n].tobytes()
            capacity *= 4

    def decode_with_indexes(self, data: bytes, indexes) -> np.ndarray:
        indexes = _as_i32(indexes).ravel()
        if self.lib is None:
            return _py_decode(data, indexes, self.cdfs, self.cdf_lengths,
                              self.offsets)
        if self._coarse is None:
            self._build_coarse_lut()
        byte_arr = np.frombuffer(data, np.uint8)
        out = np.empty(indexes.size, np.int32)
        self.lib.rans_decode_with_indexes_coarse(
            _u8p(byte_arr), byte_arr.size, _i32p(indexes), indexes.size,
            _i32p(self.cdfs), self.cdf_stride, _i32p(self.cdf_lengths),
            _i32p(self.offsets),
            self._coarse.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            self._coarse.shape[1], _i32p(out))
        return out

    # ---- cyclic int16 wire fast path (channels-last device layout) ------
    def encode_cyclic_i16(self, symbols, num_dists: int) -> bytes:
        """Encode a channels-last flat int16 buffer where symbol i uses
        distribution (i % num_dists) — the device's natural NHWC layout, so
        the host never transposes, widens, or builds an index array."""
        symbols = np.ascontiguousarray(symbols, dtype=np.int16).ravel()
        if self.lib is None:
            n = symbols.size
            indexes = np.tile(np.arange(num_dists, dtype=np.int32),
                              (n + num_dists - 1) // num_dists)[:n]
            return _py_encode(symbols.astype(np.int32), indexes, self.cdfs,
                              self.cdf_lengths, self.offsets)
        capacity = max(1024, symbols.size * 8)
        while True:
            out = np.empty(capacity, np.uint8)
            n = self.lib.rans_encode_cyclic_i16(
                symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                symbols.size, num_dists, _i32p(self.cdfs), self.cdf_stride,
                _i32p(self.cdf_lengths), _i32p(self.offsets), _u8p(out),
                capacity)
            if n >= 0:
                return out[:n].tobytes()
            capacity *= 4

    def _build_coarse_lut(self):
        """256-entry (slot >> 8 -> starting symbol) table per distribution:
        L1-resident for arbitrary index orders, where a full 2^16 LUT row
        per distribution would thrash the cache. Built directly from the
        CDFs (no full-LUT intermediate); decode scans forward from the
        coarse start over the hot CDF row."""
        with self._init_lock:
            if self._coarse is not None:
                return
            n = self.cdfs.shape[0]
            slots = np.arange(0, 1 << _PRECISION, 256)
            coarse = np.empty((n, slots.size), np.int16)
            for i in range(n):
                L = int(self.cdf_lengths[i])
                coarse[i] = np.searchsorted(self.cdfs[i, :L], slots,
                                            'right') - 1
            self._coarse = np.ascontiguousarray(coarse)

    def decode_cyclic_i16(self, data: bytes, n: int,
                          num_dists: int) -> np.ndarray:
        """Inverse of encode_cyclic_i16; returns int16 (the wire dtype)."""
        if self.lib is None:
            indexes = np.tile(np.arange(num_dists, dtype=np.int32),
                              (n + num_dists - 1) // num_dists)[:n]
            return _py_decode(data, indexes, self.cdfs, self.cdf_lengths,
                              self.offsets).astype(np.int16)
        if self._coarse is None:
            self._build_coarse_lut()
        byte_arr = np.frombuffer(data, np.uint8)
        out = np.empty(n, np.int16)
        self.lib.rans_decode_cyclic_i16_coarse(
            _u8p(byte_arr), byte_arr.size, n, num_dists, _i32p(self.cdfs),
            self.cdf_stride, _i32p(self.cdf_lengths), _i32p(self.offsets),
            self._coarse.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            self._coarse.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
        return out

    def encode_with_indexes_i16(self, symbols, indexes) -> bytes:
        """Wire-dtype variant: int16 symbols + int16 per-element indexes
        (the hyperprior y path) — no host widening."""
        symbols = np.ascontiguousarray(symbols, dtype=np.int16).ravel()
        indexes = np.ascontiguousarray(indexes, dtype=np.int16).ravel()
        assert symbols.shape == indexes.shape
        if self.lib is None:
            return _py_encode(symbols.astype(np.int32),
                              indexes.astype(np.int32), self.cdfs,
                              self.cdf_lengths, self.offsets)
        i16 = ctypes.POINTER(ctypes.c_int16)
        capacity = max(1024, symbols.size * 8)
        while True:
            out = np.empty(capacity, np.uint8)
            n = self.lib.rans_encode_with_indexes_i16(
                symbols.ctypes.data_as(i16), indexes.ctypes.data_as(i16),
                symbols.size, _i32p(self.cdfs), self.cdf_stride,
                _i32p(self.cdf_lengths), _i32p(self.offsets), _u8p(out),
                capacity)
            if n >= 0:
                return out[:n].tobytes()
            capacity *= 4

    def decode_with_indexes_i16(self, data: bytes, indexes) -> np.ndarray:
        """Inverse of encode_with_indexes_i16; returns int16."""
        indexes = np.ascontiguousarray(indexes, dtype=np.int16).ravel()
        if self.lib is None:
            return _py_decode(data, indexes.astype(np.int32), self.cdfs,
                              self.cdf_lengths,
                              self.offsets).astype(np.int16)
        if self._coarse is None:
            self._build_coarse_lut()
        i16 = ctypes.POINTER(ctypes.c_int16)
        byte_arr = np.frombuffer(data, np.uint8)
        out = np.empty(indexes.size, np.int16)
        self.lib.rans_decode_with_indexes_i16_coarse(
            _u8p(byte_arr), byte_arr.size, indexes.ctypes.data_as(i16),
            indexes.size, _i32p(self.cdfs), self.cdf_stride,
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            self._coarse.ctypes.data_as(i16), self._coarse.shape[1],
            out.ctypes.data_as(i16))
        return out

    # ---- interleaved multi-lane (parallel decode; ~num_lanes speedup) ---
    def encode_interleaved(self, symbols, indexes, num_lanes=8) -> bytes:
        symbols = _as_i32(symbols).ravel()
        indexes = _as_i32(indexes).ravel()
        if self.lib is None:
            raise RuntimeError('interleaved coder requires the C++ library')
        capacity = max(4096, symbols.size * 8)
        while True:
            out = np.empty(capacity, np.uint8)
            n = self.lib.rans_encode_interleaved(
                _i32p(symbols), _i32p(indexes), symbols.size, num_lanes,
                _i32p(self.cdfs), self.cdf_stride, _i32p(self.cdf_lengths),
                _i32p(self.offsets), _u8p(out), capacity)
            if n >= 0:
                return out[:n].tobytes()
            capacity *= 4

    def decode_interleaved(self, data: bytes, indexes) -> np.ndarray:
        indexes = _as_i32(indexes).ravel()
        if self.lib is None:
            raise RuntimeError('interleaved coder requires the C++ library')
        byte_arr = np.frombuffer(data, np.uint8)
        out = np.empty(indexes.size, np.int32)
        rc = self.lib.rans_decode_interleaved(
            _u8p(byte_arr), byte_arr.size, _i32p(indexes), indexes.size,
            _i32p(self.cdfs), self.cdf_stride, _i32p(self.cdf_lengths),
            _i32p(self.offsets), _i32p(out))
        if rc != 0:
            raise ValueError('corrupt interleaved rANS stream')
        return out


class StreamingDecoder:
    """Incremental decoder over one stream: decodes chunks of symbols as
    their indexes become available (autoregressive models compute indexes
    from already-decoded symbols). C++-backed with state {x, byte pos}
    persisted across calls; pure-Python fallback matches bit-for-bit."""

    def __init__(self, coder: RansCoder, data: bytes):
        self.coder = coder
        self.data = np.frombuffer(data, np.uint8)
        self.lib = coder.lib
        if self.lib is not None:
            self._state = np.empty(2, np.int64)
            self.lib.rans_stream_init(
                _u8p(self.data), self.data.size,
                self._state.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        else:
            self._py = _PyStreamingState(bytes(data))

    def decode(self, indexes) -> np.ndarray:
        indexes = _as_i32(indexes).ravel()
        if self.lib is None:
            return self._py.decode(indexes, self.coder.cdfs,
                                   self.coder.cdf_lengths,
                                   self.coder.offsets)
        out = np.empty(indexes.size, np.int32)
        self.lib.rans_stream_decode(
            _u8p(self.data), self.data.size,
            self._state.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _i32p(indexes), indexes.size, _i32p(self.coder.cdfs),
            self.coder.cdf_stride, _i32p(self.coder.cdf_lengths),
            _i32p(self.coder.offsets), _i32p(out))
        return out


class _PyStreamingState:
    """Python fallback for StreamingDecoder (same stream format)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.x = 0
        for _ in range(4):
            self.x = (self.x << 8) | (data[self.pos]
                                      if self.pos < len(data) else 0)
            self.pos += 1

    def _advance(self, start, freq):
        mask = (1 << _PRECISION) - 1
        self.x = freq * (self.x >> _PRECISION) + (self.x & mask) - start
        while self.x < _RANS_L:
            self.x = (self.x << 8) | (self.data[self.pos]
                                      if self.pos < len(self.data) else 0)
            self.pos += 1

    def _get_bypass(self):
        mask = (1 << _PRECISION) - 1
        val = (self.x & mask) >> (_PRECISION - _BYPASS_BITS)
        self._advance(val << (_PRECISION - _BYPASS_BITS),
                      1 << (_PRECISION - _BYPASS_BITS))
        return val

    def decode(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        out = np.empty(indexes.size, np.int32)
        mask = (1 << _PRECISION) - 1
        for i, idx in enumerate(indexes.tolist()):
            cdf = cdfs[idx]
            max_value = int(cdf_lengths[idx]) - 2
            slot = self.x & mask
            s = int(np.searchsorted(cdf[:int(cdf_lengths[idx])], slot,
                                    'right')) - 1
            self._advance(int(cdf[s]), int(cdf[s + 1] - cdf[s]))
            value = s
            if s == max_value:
                n_bypass = 0
                while True:
                    val = self._get_bypass()
                    n_bypass += val
                    if val != _MAX_BYPASS:
                        break
                raw = 0
                for j in range(n_bypass):
                    raw |= self._get_bypass() << (j * _BYPASS_BITS)
                value = (-(raw + 1) // 2 if raw & 1
                         else raw // 2 + max_value)
            out[i] = value + int(offsets[idx])
        return out


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    return RansCoder(cdfs, cdf_lengths, offsets).encode_with_indexes(
        symbols, indexes)


def decode_with_indexes(data, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    return RansCoder(cdfs, cdf_lengths, offsets).decode_with_indexes(
        data, indexes)
