"""A/B the device-side rANS codec backends on the live accelerator:
XLA `lax.scan` vs the Pallas VMEM-resident kernels, at the flagship
deploy shape (55x55x24 latent -> 384 lanes) and a padded-lane shape
(28x28x24 -> 96 lanes), with an on-chip bit-exact cross-check.

Usage:  python script/bench_device_codec.py   (runs on the default
backend; on CPU the compiled kernels are unavailable and only the XLA
scan is timed).

Reference placement note: the reference entropy-codes serially on the
host in CompressAI C++ (`/root/reference/sc2bench/models/layer.py:506,
520`); this measures the TPU-native replacement's two implementations.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.ops.rans.device import (  # noqa: E402
    auto_lanes, device_rans_decode, device_rans_encode)


def _tables(C=24, support=48, seed=0):
    rng = np.random.default_rng(seed)
    cols = support + 3
    cdf = np.zeros((C, cols), np.int32)
    cdf_len = np.full((C,), support + 2, np.int32)
    off = np.full((C,), -(support // 2), np.int32)
    for c in range(C):
        w = rng.uniform(0.05, 1.0, support + 1)
        freqs = np.maximum((w / w.sum() * (1 << 16)).astype(np.int64), 1)
        freqs[-1] += (1 << 16) - freqs.sum()
        cdf[c, 1:support + 2] = np.cumsum(freqs)
    return cdf, cdf_len, off


def bench_shape(h, w, C, reps=30):
    n = h * w * C
    lanes = auto_lanes(n, cyclic_channels=C)
    cdf, cdf_len, off = _tables(C=C)
    rng = np.random.default_rng(1)
    idx = np.tile(np.arange(C, dtype=np.int32), n // C)
    sym = (rng.integers(0, cdf_len[0] - 2, n).astype(np.int32) + off[idx])
    print(f'--- {h}x{w}x{C} latent: n={n}, lanes={lanes} ---')
    results = {}
    for backend in ('xla', 'auto'):
        enc = jax.jit(lambda s: device_rans_encode(
            s, idx, cdf, cdf_len, off, num_lanes=lanes,
            cyclic_channels=C, backend=backend))
        e = enc(jnp.asarray(sym))
        assert bool(e['ok'])
        dec = jax.jit(lambda st, xs: device_rans_decode(
            st, xs, idx, cdf, cdf_len, off, n_symbols=n,
            num_lanes=lanes, cyclic_channels=C, backend=backend))
        d, valid = dec(e['streams'], e['states'])
        assert bool(valid) and np.array_equal(np.asarray(d), sym), backend
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        for _ in range(reps):
            e2 = enc(jnp.asarray(sym))
        jax.block_until_ready(e2['streams'])
        te = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            d2, _ = dec(e['streams'], e['states'])
        jax.block_until_ready(d2)
        td = (time.perf_counter() - t0) / reps
        results[backend] = (e, te, td)
        print(f'{backend:>6}: encode {n / te / 1e6:7.1f} Msym/s '
              f'({te * 1e3:6.2f} ms)   decode {n / td / 1e6:7.1f} Msym/s '
              f'({td * 1e3:6.2f} ms)')
    ex, ea = results['xla'][0], results['auto'][0]
    bitexact = all(np.array_equal(np.asarray(ex[k]), np.asarray(ea[k]))
                   for k in ('streams', 'lengths', 'states'))
    speedup_e = results['xla'][1] / results['auto'][1]
    speedup_d = results['xla'][2] / results['auto'][2]
    print(f'  auto-vs-xla wires bit-exact: {bitexact}; '
          f'speedup encode {speedup_e:.2f}x decode {speedup_d:.2f}x '
          f'(1.0x => auto gate chose the scan)')


def main():
    print('backend:', jax.default_backend())
    bench_shape(55, 55, 24)    # flagship 224px FP latent
    bench_shape(28, 28, 24)    # 112px latent -> 96 lanes (padded kernel)
    bench_shape(200, 336, 24, reps=8)   # detection 800/1344 canvas latent


if __name__ == '__main__':
    main()
