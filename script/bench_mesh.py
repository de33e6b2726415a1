#!/usr/bin/env python
"""Weak-scaling benchmark of the data-parallel distillation train step.

Runs the Entropic Student stage-1 step (teacher fwd + student fwd/bwd +
masked update, XLA-inserted gradient all-reduce — the reference's DDP
contract, SURVEY.md §2.4) over meshes of 1..N devices with a fixed
per-device batch, and reports step time + weak-scaling efficiency.

Each device count needs its own backend, so the parent re-execs one child
process per mesh size (virtual CPU devices via
--xla_force_host_platform_device_count; on a real pod slice the same child
body runs unchanged on the actual chips).

    python script/bench_mesh.py            # parent: table over 1,2,4,8
    _SC2_MESH_CHILD=<n> python script/bench_mesh.py   # child (internal)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PER_DEVICE_BATCH = 8
IMAGE = 64
STEPS = 8


def child(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.resnet import ResNet
    from sc2bench_tpu.parallel.mesh import get_mesh
    from sc2bench_tpu.train.box import DistillationBox

    assert jax.device_count() >= n_devices
    mesh = get_mesh(n_devices)
    batch = PER_DEVICE_BATCH * n_devices
    img = (batch, IMAGE, IMAGE, 3)

    teacher = ResNet(stage_sizes=(2, 2, 2, 2), num_classes=100)
    student = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=8),
        stage_sizes=(2, 2, 2, 2), num_classes=100)
    x = jnp.zeros(img, jnp.float32)
    t_vars = jax.jit(lambda r, x: teacher.init(r, x, train=False))(
        {'params': jax.random.key(0)}, x)
    t_vars = {'params': t_vars['params'],
              'batch_stats': t_vars.get('batch_stats', {})}
    s_vars = jax.jit(lambda r, x: student.init(r, x, mode='train'))(
        {'params': jax.random.key(1), 'noise': jax.random.key(2)}, x)
    s_vars = {'params': s_vars['params'],
              'batch_stats': s_vars.get('batch_stats', {})}

    stage_config = {
        'num_epochs': 1, 'train_bn': False,
        'frozen_modules': ['layer2', 'layer3', 'layer4', 'fc'],
        'optimizer': {'key': 'Adam', 'kwargs': {'lr': 1e-3}},
        'criterion': {'key': 'WeightedSumLoss', 'kwargs': {'sub_terms': {
            'layer1': {'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': 'bottleneck_layer_out',
                'teacher_module_path': 'layer1_out'}}, 'weight': 1.0},
            'bpp': {'criterion': {'key': 'BppLoss', 'kwargs': {
                'entropy_module_path': 'bottleneck_layer.eb_out',
                'reduction': 'batchmean'}}, 'weight': 0.08},
        }}},
    }
    # product path: the box replicates state and shards batches itself
    # (the same code ClassificationEngine.train runs)
    box = DistillationBox(student, s_vars, stage_config,
                          teacher_module=teacher, teacher_variables=t_vars,
                          steps_per_epoch=1, mesh=mesh)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(0, 1, img).astype(np.float32))
    yb = jnp.zeros((batch,), jnp.int32)

    metrics = box.train_step(xb, yb, jax.random.key(3))   # compile
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for i in range(STEPS):
        metrics = box.train_step(xb, yb, jax.random.key(4 + i))
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({'n': n_devices, 'batch': batch,
                      'step_ms': round(dt * 1000, 1),
                      'images_per_sec': round(batch / dt, 1)}))


def main():
    sizes = [1, 2, 4, 8]
    rows = []
    for n in sizes:
        env = dict(os.environ, _SC2_MESH_CHILD=str(n),
                   JAX_PLATFORMS='cpu',
                   XLA_FLAGS=(os.environ.get('XLA_FLAGS', '') +
                              f' --xla_force_host_platform_device_count={n}'
                              ).strip())
        env.pop('PALLAS_AXON_POOL_IPS', None)
        env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True, timeout=1200)
        if proc.returncode != 0:
            raise RuntimeError(f'n={n} child failed:\n{proc.stderr[-2000:]}')
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rows.append(json.loads(line))
                break
            except json.JSONDecodeError:
                continue
        else:
            raise RuntimeError(
                f'n={n} child produced no JSON result:\n{proc.stdout[-2000:]}')
    base = rows[0]
    print(f'# weak scaling, per-device batch {PER_DEVICE_BATCH}, '
          f'{IMAGE}x{IMAGE}, virtual CPU mesh (all devices share this '
          f"host's physical cores: the scaling signal here is constant "
          f'work/image, i.e. zero sharding overhead; physical speedup '
          f'needs real chips)')
    print(f'{"devices":>8} {"global batch":>13} {"step ms":>9} '
          f'{"core-ms/img":>12} {"overhead":>9}')
    base_work = base['step_ms'] / base['batch']
    for r in rows:
        work = r['step_ms'] / r['batch']   # total core-time per image
        print(f'{r["n"]:>8} {r["batch"]:>13} {r["step_ms"]:>9} '
              f'{work:>12.1f} {work / base_work - 1:>8.0%}')


if __name__ == '__main__':
    if os.environ.get('_SC2_MESH_CHILD'):
        child(int(os.environ['_SC2_MESH_CHILD']))
    else:
        main()
