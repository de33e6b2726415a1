#!/usr/bin/env python
"""End-to-end throughput-mode budget: where does the wall time go?

The fused programs run at ~6.3k img/s on-device (BENCH_r05) but the
end-to-end loop measures ~0.8-1k img/s through the tunnel. This probe
times each host-side stage of one wire_batch=128 group to attribute the
gap: stacking the group, the encode dispatch, the decode dispatch, the
meta read, and a full force-synced group round trip.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_runtime, force

K = 128


def t(fn, reps=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    if out is not None:
        force(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rt = build_runtime(deploy_bf16_decode=True)
    rt.activate_analysis()
    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.normal(0, 1, (1, 224, 224, 3)), jnp.float32)
              for _ in range(8)]
    grp = [images[i % 8] for i in range(K)]
    ops = rt.encode_device_wire_batch(grp)       # compile
    logits, valid = rt.decode_device_streams_batch(
        ops['streams'], ops['states'], ops['shape'])
    force(logits)

    # host-side stage costs (dispatch only — no sync except where noted)
    xs = jnp.stack(grp)
    print(f'stack 128 device arrays : {t(lambda: jnp.stack(grp)):7.2f} ms')
    print(f'enc dispatch (no sync)  : '
          f'{t(lambda: rt.encode_device_wire_batch(grp)):7.2f} ms')
    ops = rt.encode_device_wire_batch(grp)
    print(f'dec dispatch (no sync)  : '
          f'{t(lambda: rt.decode_device_streams_batch(ops["streams"], ops["states"], ops["shape"])):7.2f} ms')
    def enc_and_meta():
        np.asarray(rt.encode_device_wire_batch(grp)['meta'])
        return None
    print(f'enc + meta read (sync)  : {t(enc_and_meta):7.2f} ms')

    def full_group():
        o = rt.encode_device_wire_batch(grp)
        lg, v = rt.decode_device_streams_batch(
            o['streams'], o['states'], o['shape'])
        np.asarray(o['meta'])
        return lg
    ms = t(full_group, reps=10)
    print(f'full group (serial sync): {ms:7.2f} ms  '
          f'= {K / ms * 1e3:6.0f} img/s')

    # the product loop at several depths/workers
    import time as _time
    for depth, workers in ((8, 8), (16, 8), (32, 16)):
        stream = [images[i % 8] for i in range(1024)]
        timings = {}
        t0 = _time.perf_counter()
        rt.stream_deploy_device(stream, depth=depth, workers=workers,
                                wire_batch=K, timings=timings)
        dt = _time.perf_counter() - t0
        print(f'loop depth={depth} workers={workers}: '
              f'{1024 / dt:6.0f} img/s  '
              f'timings={ {k: round(v, 2) for k, v in timings.items()} }',
              flush=True)


if __name__ == '__main__':
    t0 = time.perf_counter()
    main()
    print(f'total {time.perf_counter() - t0:.0f}s')
