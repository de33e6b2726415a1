#!/usr/bin/env python
"""Ad-hoc split of the detection device-wire ms/image between the fused
encode+code program and the fused decode+detect program, with true
force-sync timing (dependent 4-byte fetch; `bench.py:force`).

    python script/profile_detect_wire.py [n_iter] [--bf16] [--wb K]
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


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(jnp.sum(jnp.ravel(leaf).astype(jnp.float32)[:8]))


def main(n_iter=20, bf16=False, wb=None):
    from sc2bench_tpu.models.detection.transform import RCNNTransform
    from sc2bench_tpu.models.detection.wrapper import SplitDetectionRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401

    model = registry_get('model', 'faster_rcnn_model')(
        num_classes=91,
        dtype='bfloat16' if bf16 else 'float32',
        backbone_config={
            'resnet_name': 'resnet50',
            'bottleneck_config': {
                'key': 'FPBasedResNetBottleneck',
                'kwargs': {'num_bottleneck_channels': 24,
                           'num_target_channels': 256}}})
    transform = RCNNTransform(min_size=800, max_size=1333,
                              size_divisible=32, canvas_buckets=True)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
              for _ in range(4)]
    x = jnp.zeros(transform(images[:1])[0].shape, jnp.float32)
    t0 = time.perf_counter()
    print('init...', flush=True)
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    print(f'init: {time.perf_counter() - t0:.1f}s', flush=True)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rt = SplitDetectionRuntime(model, variables)
    rt.update()
    rt.activate_analysis()
    batches = [jnp.asarray(transform([img])[0]) for img in images]
    hw = batches[0].shape[1:3]
    lanes = rt._wire_lanes(batches[0].shape)
    print(f'canvas {batches[0].shape}  lanes {lanes}', flush=True)

    # --- per-image programs ---
    t0 = time.perf_counter()
    ops = rt.encode_device_wire(batches[0], num_lanes=lanes)
    out, valid = rt._wire_decode(ops, hw, lanes)
    force(valid)
    print(f'compile: {time.perf_counter() - t0:.1f}s', flush=True)

    # encode program alone
    force(rt.encode_device_wire(batches[0], num_lanes=lanes)['states'])
    t0 = time.perf_counter()
    for i in range(n_iter):
        o = rt.encode_device_wire(batches[i % 4], num_lanes=lanes)
    force(o['states'])
    enc_ms = (time.perf_counter() - t0) / n_iter * 1000

    # decode+detect program alone (same encoded ops reused)
    opses = [rt.encode_device_wire(b, num_lanes=lanes) for b in batches]
    force(opses[-1]['states'])
    t0 = time.perf_counter()
    for i in range(n_iter):
        out, valid = rt._wire_decode(opses[i % 4], hw, lanes)
    force(valid)
    dec_ms = (time.perf_counter() - t0) / n_iter * 1000

    # chained pair, forced
    t0 = time.perf_counter()
    for i in range(n_iter):
        o = rt.encode_device_wire(batches[i % 4], num_lanes=lanes)
        out, valid = rt._wire_decode(o, hw, lanes)
    force(valid)
    pair_ms = (time.perf_counter() - t0) / n_iter * 1000
    print(f'encode: {enc_ms:.1f} ms/img   decode+detect: {dec_ms:.1f} '
          f'ms/img   pair: {pair_ms:.1f} ms/img', flush=True)

    # pipelined stream (the serving number), with stage timings
    stream = [batches[i % 4] for i in range(n_iter)]
    for wire_batch in ([None, 4] if wb is None else [wb]):
        rt.stream_detect_device(stream[:4], wire_batch=wire_batch)
        timings = {}
        t0 = time.perf_counter()
        rt.stream_detect_device(stream, depth=8, workers=4,
                                wire_batch=wire_batch, timings=timings)
        ms = (time.perf_counter() - t0) / n_iter * 1000
        stages = {k: round(v / n_iter * 1000, 2) for k, v in
                  timings.items()}
        print(f'stream wire_batch={wire_batch}: {ms:.1f} ms/img '
              f'({1000 / ms:.1f} img/s)  stages/img: {stages}', flush=True)


if __name__ == '__main__':
    argv = [a for a in sys.argv[1:] if not a.startswith('--')]
    wb = None
    for a in sys.argv[1:]:
        if a.startswith('--wb'):
            wb = int(a.split('=')[1] if '=' in a else sys.argv[
                sys.argv.index(a) + 1])
    main(int(argv[0]) if argv else 20, bf16='--bf16' in sys.argv[1:], wb=wb)
