#!/usr/bin/env python
"""Entropy-coder microbenchmark: throughput of the C++ rANS (single-stream
and interleaved) and the pure-Python oracle on FP-bottleneck-shaped symbol
streams. The north-star target is >=5x a CompressAI-CPU-class single-stream
coder (BASELINE.md); the Python oracle stands in for "interpreter-bound"
and the single-stream C++ for "CompressAI-class".

    python script/bench_entropy.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from sc2bench_tpu.ops.math import pmf_to_quantized_cdf  # noqa: E402
from sc2bench_tpu.ops.rans.coder import (  # noqa: E402
    RansCoder, _py_decode, _py_encode)


def main():
    rng = np.random.default_rng(0)
    channels = 24
    rows, lengths, offsets = [], [], []
    for _ in range(channels):
        # peaked laplacian-ish pmf like a trained bottleneck channel
        support = np.arange(-20, 21)
        pmf = np.exp(-np.abs(support) / rng.uniform(0.5, 3.0))
        pmf /= pmf.sum()
        row = pmf_to_quantized_cdf(np.concatenate([pmf, [1e-9]]), 16)
        rows.append(row)
        lengths.append(len(row))
        offsets.append(-20)
    max_len = max(lengths)
    cdfs = np.zeros((channels, max_len), np.int32)
    for i, r in enumerate(rows):
        cdfs[i, :len(r)] = r
    coder = RansCoder(cdfs, np.asarray(lengths, np.int32),
                      np.asarray(offsets, np.int32))

    # one ResNet-50 FP latent: 24 x 56 x 56 channel-major
    n = channels * 56 * 56
    indexes = np.repeat(np.arange(channels, dtype=np.int32), 56 * 56)
    symbols = np.clip(rng.laplace(0, 2, n), -20, 20).round().astype(np.int32)

    def run(name, enc, dec, reps, expect=None):
        expect = symbols if expect is None else expect
        t0 = time.perf_counter()
        for _ in range(reps):
            data = enc()
        te = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            out = dec(data)
        td = (time.perf_counter() - t0) / reps
        assert (out == expect).all()
        print(f'{name:>22}: encode {n / te / 1e6:7.1f} Msym/s   '
              f'decode {n / td / 1e6:7.1f} Msym/s   '
              f'({len(data)} bytes/latent)')
        return n / te / 1e6, n / td / 1e6

    cpp = run('C++ single-stream',
              lambda: coder.encode_with_indexes(symbols, indexes),
              lambda d: coder.decode_with_indexes(d, indexes), 20)
    run('C++ interleaved x8',
        lambda: coder.encode_interleaved(symbols, indexes, 8),
        lambda d: coder.decode_interleaved(d, indexes), 20)
    # cyclic int16 wire path (deploy-loop hot path): symbols channels-last,
    # index implicit — no index array, transposes, or int32 widening
    sym_i16 = symbols.reshape(channels, -1).T.reshape(-1).astype(np.int16)
    run('C++ cyclic int16',
        lambda: coder.encode_cyclic_i16(sym_i16, channels),
        lambda d: coder.decode_cyclic_i16(d, n, channels), 20,
        expect=sym_i16)
    py = run('Python oracle',
             lambda: _py_encode(symbols, indexes, coder.cdfs,
                                coder.cdf_lengths, coder.offsets),
             lambda d: _py_decode(d, indexes, coder.cdfs, coder.cdf_lengths,
                                  coder.offsets), 1)
    print(f'C++ vs python-interpreter class: {cpp[0] / py[0]:.0f}x encode, '
          f'{cpp[1] / py[1]:.0f}x decode')


if __name__ == '__main__':
    main()
