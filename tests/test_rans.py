"""Bit-exact round-trip tests for the rANS coder (C++ and Python paths)."""
import numpy as np
import pytest

from sc2bench_tpu.ops.math import pmf_to_quantized_cdf
from sc2bench_tpu.ops.rans.coder import (
    RansCoder, _load_library, _py_decode, _py_encode)


def _make_tables(rng, num_dists=4, alphabet=16):
    cdfs, lengths, offsets = [], [], []
    for _ in range(num_dists):
        pmf = rng.dirichlet(np.ones(alphabet))
        tail = 1e-6
        row = pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]), 16)
        cdfs.append(row)
        lengths.append(len(row))
        offsets.append(int(rng.integers(-10, 10)))
    max_len = max(lengths)
    cdf_mat = np.zeros((num_dists, max_len), np.int32)
    for i, row in enumerate(cdfs):
        cdf_mat[i, :len(row)] = row
    return cdf_mat, np.asarray(lengths, np.int32), np.asarray(offsets, np.int32)


def test_pmf_to_quantized_cdf_properties():
    rng = np.random.default_rng(0)
    pmf = rng.dirichlet(np.ones(64) * 0.1)
    cdf = pmf_to_quantized_cdf(np.concatenate([pmf, [1e-9]]), 16)
    assert cdf[0] == 0 and cdf[-1] == 1 << 16
    freqs = np.diff(cdf)
    assert np.all(freqs >= 1)
    # Quantized distribution close to the source pmf
    q = freqs[:-1] / (1 << 16)
    assert np.abs(q - pmf).max() < 2e-3


@pytest.mark.parametrize('use_cpp', [False, True])
def test_roundtrip_in_range(use_cpp):
    if use_cpp and _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(1)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 5000
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    # symbols within each table's supported range
    max_vals = lengths[indexes] - 2
    symbols = (rng.integers(0, 1 << 16, n) % max_vals).astype(np.int32) \
        + offsets[indexes]
    coder = RansCoder(cdfs, lengths, offsets, use_cpp=use_cpp)
    data = coder.encode_with_indexes(symbols, indexes)
    decoded = coder.decode_with_indexes(data, indexes)
    np.testing.assert_array_equal(decoded, symbols)


@pytest.mark.parametrize('use_cpp', [False, True])
def test_roundtrip_with_escapes(use_cpp):
    if use_cpp and _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(2)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 2000
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    # wild out-of-range symbols exercise the bypass path
    symbols = rng.integers(-5000, 5000, n).astype(np.int32)
    coder = RansCoder(cdfs, lengths, offsets, use_cpp=use_cpp)
    data = coder.encode_with_indexes(symbols, indexes)
    decoded = coder.decode_with_indexes(data, indexes)
    np.testing.assert_array_equal(decoded, symbols)


def test_cpp_python_bitstream_identical():
    if _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(3)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 500
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    symbols = rng.integers(-50, 50, n).astype(np.int32)
    cpp = RansCoder(cdfs, lengths, offsets, use_cpp=True)
    data_cpp = cpp.encode_with_indexes(symbols, indexes)
    data_py = _py_encode(symbols, indexes, cdfs, lengths, offsets)
    assert data_cpp == data_py
    # cross-decode
    np.testing.assert_array_equal(
        _py_decode(data_cpp, indexes, cdfs, lengths, offsets), symbols)


def test_compression_ratio_near_entropy():
    """Coded size should approach the Shannon bound for a skewed source."""
    rng = np.random.default_rng(4)
    alphabet = 32
    pmf = rng.dirichlet(np.ones(alphabet) * 0.2)
    row = pmf_to_quantized_cdf(np.concatenate([pmf, [1e-9]]), 16)
    cdfs = row[None, :].astype(np.int32)
    lengths = np.asarray([len(row)], np.int32)
    offsets = np.asarray([0], np.int32)
    n = 20000
    symbols = rng.choice(alphabet, n, p=pmf).astype(np.int32)
    indexes = np.zeros(n, np.int32)
    coder = RansCoder(cdfs, lengths, offsets)
    data = coder.encode_with_indexes(symbols, indexes)
    entropy_bits = -np.sum(pmf * np.log2(pmf)) * n
    actual_bits = len(data) * 8
    assert actual_bits < entropy_bits * 1.02 + 64


@pytest.mark.parametrize('num_lanes', [1, 3, 8])
def test_interleaved_roundtrip(num_lanes):
    if _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(7)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 4001  # odd: exercises uneven lane lengths
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    symbols = rng.integers(-300, 300, n).astype(np.int32)  # with escapes
    coder = RansCoder(cdfs, lengths, offsets)
    data = coder.encode_interleaved(symbols, indexes, num_lanes=num_lanes)
    decoded = coder.decode_interleaved(data, indexes)
    np.testing.assert_array_equal(decoded, symbols)


def test_interleaved_size_overhead_small():
    if _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(8)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 20000
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    max_vals = lengths[indexes] - 2
    symbols = (rng.integers(0, 1 << 16, n) % max_vals).astype(np.int32) \
        + offsets[indexes]
    coder = RansCoder(cdfs, lengths, offsets)
    single = coder.encode_with_indexes(symbols, indexes)
    inter = coder.encode_interleaved(symbols, indexes, num_lanes=8)
    # per-lane flush + header overhead stays tiny (< 1%)
    assert len(inter) < len(single) * 1.01 + 64


@pytest.mark.parametrize('use_cpp', [False, True])
def test_cyclic_i16_roundtrip(use_cpp):
    """The channels-last wire fast path round-trips exactly, including
    escape-coded out-of-range symbols, and matches the generic coder's
    size within a few bytes (same symbols/CDFs, different order)."""
    if use_cpp and _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(7)
    cdfs, lengths, offsets = _make_tables(rng)
    c = len(lengths)
    n = c * 517  # non-trivial cyclic length
    indexes = np.tile(np.arange(c, dtype=np.int32), 517)
    max_vals = lengths[indexes] - 2
    symbols = ((rng.integers(0, 1 << 16, n) % max_vals)
               + offsets[indexes]).astype(np.int16)
    symbols[::97] = 300   # out of any table's range -> escape path
    symbols[::131] = -280
    coder = RansCoder(cdfs, lengths, offsets, use_cpp=use_cpp)
    data = coder.encode_cyclic_i16(symbols, c)
    decoded = coder.decode_cyclic_i16(data, n, c)
    assert decoded.dtype == np.int16
    np.testing.assert_array_equal(decoded, symbols)
    generic = coder.encode_with_indexes(symbols.astype(np.int32), indexes)
    assert abs(len(data) - len(generic)) <= 8
    # and cross-checks against the generic decoder on the same stream layout
    np.testing.assert_array_equal(
        coder.decode_with_indexes(data, indexes), symbols.astype(np.int32))


def test_streaming_decoder_matches_full_decode():
    """Chunked streaming decode (C++ state persisted across calls, and the
    Python fallback) reproduces the one-shot decoder exactly."""
    from sc2bench_tpu.ops.rans.coder import StreamingDecoder
    rng = np.random.default_rng(11)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 4000
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    max_vals = lengths[indexes] - 2
    symbols = ((rng.integers(0, 1 << 16, n) % max_vals)
               + offsets[indexes]).astype(np.int32)
    symbols[::211] = 400  # escapes
    coder = RansCoder(cdfs, lengths, offsets)
    data = coder.encode_with_indexes(symbols, indexes)
    full = coder.decode_with_indexes(data, indexes)

    for use_cpp in ([False, True] if _load_library() is not None
                    else [False]):
        c = RansCoder(cdfs, lengths, offsets, use_cpp=use_cpp)
        dec = StreamingDecoder(c, data)
        out, pos = [], 0
        for chunk in [1, 7, 100, 892, 3000]:
            out.append(dec.decode(indexes[pos:pos + chunk]))
            pos += chunk
        out.append(dec.decode(indexes[pos:]))
        np.testing.assert_array_equal(np.concatenate(out), full)


@pytest.mark.parametrize('use_cpp', [False, True])
def test_indexed_i16_roundtrip(use_cpp):
    """int16-symbols/int16-indexes wire variant: exact round trip incl.
    escapes, and byte-identical to the generic int32 coder (same symbol
    order, same CDFs)."""
    if use_cpp and _load_library() is None:
        pytest.skip('C++ rANS unavailable')
    rng = np.random.default_rng(13)
    cdfs, lengths, offsets = _make_tables(rng)
    n = 3000
    indexes = rng.integers(0, len(lengths), n).astype(np.int16)
    max_vals = lengths[indexes.astype(np.int32)] - 2
    symbols = ((rng.integers(0, 1 << 16, n) % max_vals)
               + offsets[indexes.astype(np.int32)]).astype(np.int16)
    symbols[::173] = 500
    coder = RansCoder(cdfs, lengths, offsets, use_cpp=use_cpp)
    data = coder.encode_with_indexes_i16(symbols, indexes)
    assert data == coder.encode_with_indexes(symbols.astype(np.int32),
                                             indexes.astype(np.int32))
    out = coder.decode_with_indexes_i16(data, indexes)
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, symbols)
