#!/usr/bin/env python
"""Why does the in-program RoI stage cost more than align+head in
isolation? A/B: full detect vs detect with constant proposals (breaks
the propose->roi dependency) vs rpn_only.

    python script/profile_roi_inprog.py [n_iter]
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
    return sum(jnp.sum(jnp.asarray(l, jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if not isinstance(l, (int, float)))


def main(n=20):
    from sc2bench_tpu.models.detection.transform import RCNNTransform
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401

    model = registry_get('model', 'faster_rcnn_model')(
        num_classes=91,
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
    x = jnp.asarray(transform([img])[0])
    hw = tuple(x.shape[1:3])
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    props = jnp.asarray(
        np.stack([rng.uniform(0, hw[1] - 64, (1, 1000)),
                  rng.uniform(0, hw[0] - 64, (1, 1000)),
                  rng.uniform(64, hw[1], (1, 1000)),
                  rng.uniform(64, hw[0], (1, 1000))],
                 axis=-1).astype(np.float32))

    def run(name, fn):
        f = jax.jit(fn)
        r = f(variables, x)
        force(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(variables, x)
        force(r)
        ms = (time.perf_counter() - t0) / n * 1000
        print(f'{name:34s} {ms:7.2f} ms', flush=True)

    def rpn_only(v, x):
        def m_fn(mod, x):
            feats = mod.extract_features(x, 'finetune', False)
            return mod.detect(feats, hw, False, rpn_only=True)
        return small(model.apply(v, x, method=m_fn))

    def full(v, x):
        def m_fn(mod, x):
            feats = mod.extract_features(x, 'finetune', False)
            return mod.detect(feats, hw, False)
        return small(model.apply(v, x, method=m_fn))

    def const_props(v, x):
        def m_fn(mod, x):
            feats = mod.extract_features(x, 'finetune', False)
            out = mod.detect(feats, hw, False, rpn_only=True)
            cls, reg = mod.roi_predict(feats, props, hw)
            out['class_logits'] = cls
            out['box_regression'] = reg
            return out
        return small(model.apply(v, x, method=m_fn))

    def roi_only(v, x):
        def m_fn(mod, x):
            feats = mod.extract_features(x, 'finetune', False)
            cls, reg = mod.roi_predict(feats, props, hw)
            return cls, reg
        return small(model.apply(v, x, method=m_fn))

    run('backbone+fpn+rpn (rpn_only)', rpn_only)
    run('+roi on propose output (full)', full)
    run('+roi on constant proposals', const_props)
    run('backbone+fpn+roi (no rpn head)', roi_only)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
