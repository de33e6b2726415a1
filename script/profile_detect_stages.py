#!/usr/bin/env python
"""Stage ablation of the detection device-wire DECODE program: times
cumulative prefixes (rANS decode -> bottleneck decode -> backbone tail ->
FPN -> RPN/propose -> RoI heads -> postprocess+NMS) as separate jitted
programs, so the per-stage cost is the successive difference. True
force-sync timing (dependent 4-byte fetch; `bench.py:force`).

    python script/profile_detect_stages.py [n_iter] [--bf16]
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


def small(tree):
    """Reduce every leaf so nothing is DCE'd but the output is tiny."""
    return sum(jnp.sum(jnp.asarray(l, jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if not isinstance(l, (int, float)))


def main(n_iter=20, bf16=False):
    from sc2bench_tpu.models.detection.transform import RCNNTransform
    from sc2bench_tpu.models.detection.wrapper import SplitDetectionRuntime
    from sc2bench_tpu.ops.rans.device import device_rans_decode
    from sc2bench_tpu.models.detection.rcnn import postprocess_detections
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
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    x = jnp.zeros(transform([img])[0].shape, jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rt = SplitDetectionRuntime(model, variables)
    rt.update()
    batch = jnp.asarray(transform([img])[0])
    hw = batch.shape[1:3]
    lanes = rt._wire_lanes(batch.shape)
    ops = rt.encode_device_wire(batch, num_lanes=lanes)
    h, w, c = ops['lat_shape']
    cdf, cdf_len, off = rt._device_tables()
    print(f'canvas {batch.shape}  latent {(h, w, c)}  lanes {lanes}',
          flush=True)

    def rans_dec(streams, states):
        idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), h * w)
        flat, valid = device_rans_decode(
            streams, states, idx, cdf, cdf_len, off,
            n_symbols=h * w * c, num_lanes=lanes, cyclic_channels=c)
        return flat.reshape(1, h, w, c), valid

    def stage_fns():
        def s1(v, streams, states, m):
            flat, valid = rans_dec(streams, states)
            return small((flat, valid))

        def s2(v, streams, states, m):
            flat, valid = rans_dec(streams, states)
            c2 = model.apply(v, flat, m,
                             method=lambda mod, s, med:
                                 mod.decode_ops(s, med))
            return small((c2, valid))

        def s3(v, streams, states, m):
            flat, valid = rans_dec(streams, states)

            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                return mod.backbone.forward_tail(c2, False)
            return small((model.apply(v, flat, m, method=m_fn), valid))

        def s4(v, streams, states, m):
            flat, valid = rans_dec(streams, states)

            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                return mod.fpn(mod.backbone.forward_tail(c2, False))
            return small((model.apply(v, flat, m, method=m_fn), valid))

        def s5(v, streams, states, m):
            flat, valid = rans_dec(streams, states)

            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                feats = mod.fpn(mod.backbone.forward_tail(c2, False))
                return mod.detect(feats, tuple(hw), False, rpn_only=True)
            return small((model.apply(v, flat, m, method=m_fn), valid))

        def s6(v, streams, states, m):
            flat, valid = rans_dec(streams, states)

            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                feats = mod.fpn(mod.backbone.forward_tail(c2, False))
                return mod.detect(feats, tuple(hw), False)
            return small((model.apply(v, flat, m, method=m_fn), valid))

        def s7(v, streams, states, m):
            flat, valid = rans_dec(streams, states)

            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                feats = mod.fpn(mod.backbone.forward_tail(c2, False))
                return postprocess_detections(
                    mod.detect(feats, tuple(hw), False))
            return small((model.apply(v, flat, m, method=m_fn), valid))

        return [('rans_decode', s1), ('+bottleneck_dec', s2),
                ('+backbone_tail', s3), ('+fpn', s4),
                ('+rpn_propose', s5), ('+roi_heads', s6),
                ('+postprocess_nms', s7)]

    prev = 0.0
    for name, fn in stage_fns():
        f = jax.jit(fn)
        t0 = time.perf_counter()
        r = f(variables, ops['streams'], ops['states'], rt._medians_dev)
        force(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = f(variables, ops['streams'], ops['states'],
                  rt._medians_dev)
        force(r)
        ms = (time.perf_counter() - t0) / n_iter * 1000
        print(f'{name:18s} {ms:7.2f} ms  (+{ms - prev:6.2f})   '
              f'[compile {compile_s:.0f}s]', flush=True)
        prev = ms


if __name__ == '__main__':
    argv = [a for a in sys.argv[1:] if not a.startswith('--')]
    main(int(argv[0]) if argv else 20, bf16='--bf16' in sys.argv[1:])
