#!/usr/bin/env python
"""Detection deploy microbenchmark at the DEFAULT eval geometry (the
reference's min/max 800/1333 with bucketed canvases — the engine default
since r3). Measures ms/image through the full deploy pipeline at batch 1:

    RCNNTransform (800/1333, landscape bucket 832x1344) -> encoder ->
    rANS over the 208x336x24 latent -> decode -> FPN/RPN/RoI/NMS

Not the driver bench (bench.py is); run ad hoc:
    python script/bench_detect.py [n_iter]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sc2bench_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main(n_iter=20, bf16=False):
    import jax.numpy as jnp
    from sc2bench_tpu.models.detection.transform import RCNNTransform
    from sc2bench_tpu.models.detection.wrapper import SplitDetectionRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401 (registrations)

    model = registry_get('model', 'faster_rcnn_model')(
        num_classes=91,
        dtype='bfloat16' if bf16 else 'float32',
        backbone_config={
            'resnet_name': 'resnet50',
            'bottleneck_config': {
                'key': 'FPBasedResNetBottleneck',
                'kwargs': {'num_bottleneck_channels': 24,
                           'num_target_channels': 256}}})
    print('dtype:', 'bfloat16' if bf16 else 'float32', flush=True)
    transform = RCNNTransform(min_size=800, max_size=1333,
                              size_divisible=32, canvas_buckets=True)
    # landscape bucket (the dominant COCO aspect ratio)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
              for _ in range(4)]
    batch, scales, _ = transform(images[:1])
    print('canvas:', batch.shape, flush=True)

    x = jnp.zeros(batch.shape, jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rt = SplitDetectionRuntime(model, variables)
    rt.update()
    rt.activate_analysis()

    batches = [jnp.asarray(transform([img])[0]) for img in images]
    # warmup/compile both paths
    t0 = time.perf_counter()
    rt.stream_detect(batches[:2])
    print(f'compile+warm: {time.perf_counter() - t0:.1f}s', flush=True)

    # serial reference-API loop
    t0 = time.perf_counter()
    for i in range(n_iter):
        dets = rt.detect(batches[i % len(batches)]) \
            if hasattr(rt, 'detect') else \
            rt.stream_detect([batches[i % len(batches)]])[0]
    jax.block_until_ready(jax.tree.leaves(dets)[0]) \
        if hasattr(dets, 'keys') else None
    serial_ms = (time.perf_counter() - t0) / n_iter * 1000

    # pipelined stream
    stream = [batches[i % len(batches)] for i in range(n_iter)]
    t0 = time.perf_counter()
    rt.stream_detect(stream)
    stream_ms = (time.perf_counter() - t0) / n_iter * 1000

    print(f'serial: {serial_ms:.0f} ms/img   '
          f'pipelined: {stream_ms:.0f} ms/img   '
          f'({1000 / stream_ms:.1f} img/s)')

    # device-rANS wire (entropy coding fused on-device; 8-byte meta/img)
    t0 = time.perf_counter()
    rt.stream_detect_device(batches[:2])
    print(f'device-wire compile+warm: {time.perf_counter() - t0:.1f}s',
          flush=True)
    t0 = time.perf_counter()
    rt.stream_detect_device(stream, depth=8, workers=4)
    dev_ms = (time.perf_counter() - t0) / n_iter * 1000
    print(f'device-wire: {dev_ms:.0f} ms/img ({1000 / dev_ms:.1f} img/s)')
    summary = rt.summarize()[0]
    print(f'data size: {summary["mean"]:.1f} {summary["unit"]}/image')


if __name__ == '__main__':
    argv = [a for a in sys.argv[1:] if a != '--bf16']
    main(int(argv[0]) if argv else 20, bf16='--bf16' in sys.argv[1:])
