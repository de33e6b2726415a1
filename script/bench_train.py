#!/usr/bin/env python
"""Training-throughput microbenchmark: images/sec for the Entropic Student
stage-1 distillation step (teacher fwd + student fwd/bwd + masked update) at
a production batch size, float32 vs bfloat16 tails.

Not the driver bench (bench.py is); run ad hoc:
    python script/bench_train.py [batch] [steps]
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
    """True execution barrier: the tunneled backend's block_until_ready
    resolves without waiting (bench.py:force)."""
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8]))


def build(dtype, batch, image=160):
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.resnet import ResNet
    from sc2bench_tpu.train.box import DistillationBox
    teacher = ResNet(stage_sizes=(3, 4, 6, 3), num_classes=1000, dtype=dtype)
    student = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=24, dtype=dtype),
        stage_sizes=(3, 4, 6, 3), num_classes=1000, dtype=dtype)
    x = jnp.zeros((batch, image, image, 3))
    t_vars = jax.jit(lambda r, x: teacher.init(r, x, train=False))(
        {'params': jax.random.key(0)}, x)
    t_vars = {'params': t_vars['params'],
              'batch_stats': t_vars.get('batch_stats', {})}
    s_vars = jax.jit(lambda r, x: student.init(r, x, mode='train'))(
        {'params': jax.random.key(1), 'noise': jax.random.key(2)}, x)
    s_vars = {'params': s_vars['params'],
              'batch_stats': s_vars.get('batch_stats', {})}
    stage = {
        'num_epochs': 1, 'train_bn': False,
        'frozen_modules': ['layer2', 'layer3', 'layer4', 'fc'],
        'optimizer': {'key': 'Adam', 'kwargs': {'lr': 1e-3}},
        'criterion': {'key': 'WeightedSumLoss', 'kwargs': {'sub_terms': {
            'l1': {'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': 'bottleneck_layer_out',
                'teacher_module_path': 'layer1_out', 'reduction': 'sum'}},
                'weight': 1.0},
            'l4': {'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': 'layer4_out',
                'teacher_module_path': 'layer4_out', 'reduction': 'sum'}},
                'weight': 1.0},
            'bpp': {'criterion': {'key': 'BppLoss', 'kwargs': {
                'entropy_module_path': 'bottleneck_layer.eb_out',
                'reduction': 'batchmean'}}, 'weight': 0.08},
        }}},
    }
    box = DistillationBox(student, s_vars, stage, teacher_module=teacher,
                          teacher_variables=t_vars, steps_per_epoch=100)
    return box, x


def measure(dtype, batch, steps):
    box, x = build(dtype, batch)
    xr = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, x.shape), jnp.float32)
    y = jnp.zeros((x.shape[0],), jnp.int32)
    box.train_step(xr, y, jax.random.key(0))          # compile
    _force(box.state.params)
    t0 = time.perf_counter()
    for i in range(steps):
        box.train_step(xr, y, jax.random.key(i))
    _force(box.state.params)
    dt = time.perf_counter() - t0
    return batch * steps / dt


if __name__ == '__main__':
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    for name, dtype in [('float32', jnp.float32),
                        ('bfloat16', jnp.bfloat16)]:
        ips = measure(dtype, batch, steps)
        print(f'{name}: {ips:.1f} images/sec (train step, batch {batch})')
