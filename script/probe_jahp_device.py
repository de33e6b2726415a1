#!/usr/bin/env python
"""JAHP deploy coding: host wavefront vs fused TPU wavefront wire.

Times mbt2018 (n=m=192) encode+decode at 64^2 and 256^2 on the live
backend. Baseline (r4, host wavefront coder): 99/58 ms encode/decode at
64^2 (docs/performance.md). VERDICT r5 item 4 target: encode+decode
<= ~30 ms at 64^2, 256^2 materially faster, bit-exact round trip.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sc2bench_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8]))


def main():
    from sc2bench_tpu.models.zoo_jahp import (JointAutoregressiveCodec,
                                              JointAutoregressiveRuntime)
    module = JointAutoregressiveCodec(n=192, m=192)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: module.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    # random-init ep layers emit near-zero scales -> narrow CDF rows ->
    # out-of-support symbols (the escape path). Trained models calibrate
    # scales to the latent range; emulate that for the perf probe by
    # biasing the scale half of the entropy-parameters output to ~4.
    import flax
    params = flax.core.unfreeze(variables['params'])
    b = np.asarray(params['ep2']['bias']).copy()
    b[:module.m] = 4.0
    params['ep2']['bias'] = jnp.asarray(b)
    variables = {'params': params, 'batch_stats': variables['batch_stats']}
    rt = JointAutoregressiveRuntime(module, variables)
    rt.update()

    for size in (64, 256):
        x = jax.random.uniform(jax.random.key(3), (1, size, size, 3))
        # --- device wire ---
        ops = rt.encode_device_wire(x)                       # compile
        img, valid = rt.decode_device_wire(ops)
        _force(img)
        ok, nbytes = (int(v) for v in np.asarray(ops['meta']))
        assert ok == 1 and bool(np.asarray(valid)), (ok, valid)
        np.testing.assert_array_equal(
            np.asarray(rt._last_y_hat_dec_device), np.asarray(ops['y_hat']))
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            ops = rt.encode_device_wire(x)
        _force(ops['y_states'])
        t_enc = (time.perf_counter() - t0) / reps * 1e3
        t0 = time.perf_counter()
        for _ in range(reps):
            img, valid = rt.decode_device_wire(ops)
        _force(img)
        t_dec = (time.perf_counter() - t0) / reps * 1e3
        print(f'{size}^2 device wire: enc {t_enc:7.1f} ms  '
              f'dec {t_dec:7.1f} ms  pair {t_enc + t_dec:7.1f} ms  '
              f'({nbytes} B, bit-exact roundtrip)', flush=True)

        # --- host wavefront path ---
        reps_h = 3 if size == 64 else 1
        comp = rt.compress(x)                                # warm
        rt.decompress(**comp)
        t0 = time.perf_counter()
        for _ in range(reps_h):
            comp = rt.compress(x)
        t_enc_h = (time.perf_counter() - t0) / reps_h * 1e3
        t0 = time.perf_counter()
        for _ in range(reps_h):
            rt.decompress(**comp)
        t_dec_h = (time.perf_counter() - t0) / reps_h * 1e3
        nb = sum(len(s) for grp in comp['strings'] for s in grp)
        print(f'{size}^2 host coder:  enc {t_enc_h:7.1f} ms  '
              f'dec {t_dec_h:7.1f} ms  pair {t_enc_h + t_dec_h:7.1f} ms  '
              f'({nb} B)', flush=True)


if __name__ == '__main__':
    t0 = time.perf_counter()
    main()
    print(f'total {time.perf_counter() - t0:.0f}s')
