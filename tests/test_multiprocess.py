"""Real multi-process `jax.distributed` tests for the cross-process gather
paths (VERDICT round-1 item 9): `SmoothedValue.synchronize_between_processes`
and the COCO prediction allgather, which otherwise only run under
`process_count() == 1` short-circuits.

Spawns 2 CPU processes that rendezvous via `jax.distributed.initialize`
(the reference's `init_distributed_mode`/NCCL contract, SURVEY.md §5.8)."""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

CHILD = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    # --- MetricLogger / SmoothedValue sync ---
    from sc2bench_tpu.utils.metrics import MetricLogger
    meter = MetricLogger()
    # process 0 logs [1, 2]; process 1 logs [3, 4] -> global avg 2.5
    for v in ([1.0, 2.0] if pid == 0 else [3.0, 4.0]):
        meter.update(acc=v)
    meter.synchronize_between_processes()
    got = meter.meters['acc'].global_avg
    assert abs(got - 2.5) < 1e-9, got

    # --- COCO prediction allgather ---
    from sc2bench_tpu.utils.coco_eval import CocoEvaluator
    ev = CocoEvaluator()
    gt = {'image_id': pid, 'boxes': np.asarray([[0., 0., 10., 10.]]),
          'labels': np.asarray([1]), 'area': np.asarray([100.0]),
          'iscrowd': np.asarray([0])}
    ev.add_gt(gt)
    ev.update({pid: {'boxes': np.asarray([[0., 0., 10., 10.]]),
                     'scores': np.asarray([0.9]),
                     'labels': np.asarray([1])}})
    ev.synchronize_between_processes()
    assert set(ev.preds.keys()) == {0, 1}, sorted(ev.preds.keys())
    print(f'CHILD_{pid}_OK')
""")


@pytest.mark.slow
def test_two_process_gathers():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)  # sitecustomize re-pins TPU
    env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = str(REPO) + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, '-c', CHILD, str(pid), port],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out[-3000:]}'
        assert f'CHILD_{pid}_OK' in out


ENGINE_CHILD = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8
    assert len(jax.local_devices()) == 4

    # --- ClassificationEngine.evaluate through sharded loaders ---
    import __graft_entry__ as graft
    from sc2bench_tpu.train.engine import ClassificationEngine
    config = graft.tiny_entropic_student_config(8)
    config['train']['val_data_loader']['dataset']['kwargs'][
        'num_samples'] = 16
    engine = ClassificationEngine(config, image_size=(32, 32), seed=0)
    # (a) per-process shard (8 imgs each) -> metric sync reduces to the
    #     16-image global result
    sharded = engine.build_loader(config['train']['val_data_loader'],
                                  shard_over_processes=True)
    assert len(sharded.dataset) == 16 and sharded.num_shards == 2
    res_sharded = engine.evaluate(sharded)
    # (b) both processes score the FULL dataset -> sync averages two
    #     identical passes = the single-process result
    full = engine.build_loader(config['train']['val_data_loader'])
    res_full = engine.evaluate(full)
    for k in ('acc1', 'acc5'):
        assert abs(res_sharded[k] - res_full[k]) < 1e-9, (
            k, res_sharded[k], res_full[k])

    # --- DetectionEngine.evaluate + CocoEvaluator through the engine ---
    from sc2bench_tpu.train.det_engine import DetectionEngine
    det_config = {
        'dependencies': ['sc2bench_tpu.models'],
        'min_size': 64, 'canvas_size': 64, 'max_boxes': 8,
        'models': {'model': {
            'key': 'faster_rcnn_model',
            'kwargs': {'num_classes': 5,
                       'backbone_config': {
                           'resnet_name': 'resnet50',
                           'bottleneck_config': {
                               'key': 'FPBasedResNetBottleneck',
                               'kwargs': {'num_bottleneck_channels': 8,
                                          'num_target_channels': 256}}}}}},
    }
    det = DetectionEngine(det_config)
    det_loader_cfg = {'dataset': {'key': 'SyntheticDetectionDataset',
                                  'kwargs': {'num_samples': 4,
                                             'image_size': [64, 64],
                                             'num_classes': 5}},
                      'batch_size': 1}
    stats_sharded = det.evaluate(
        det.build_loader(det_loader_cfg, shard_over_processes=True))
    # duplicate predictions from both full passes collapse by image_id
    stats_full = det.evaluate(det.build_loader(det_loader_cfg))
    assert abs(stats_sharded['AP'] - stats_full['AP']) < 1e-9, (
        stats_sharded['AP'], stats_full['AP'])

    # --- multi-process TRAIN through the engine (global-mesh DDP) ---
    # each process feeds its 4-row loader shard; shard_batch assembles the
    # 8-row global batch over the 2x4-device mesh
    # (jax.make_array_from_process_local_data) and XLA's all-reduce spans
    # both processes — the reference's multi-node DDP contract.
    train_cfg = graft.tiny_entropic_student_config(4)
    train_cfg['train']['train_data_loader']['dataset']['kwargs'][
        'num_samples'] = 8
    train_engine = ClassificationEngine(train_cfg, image_size=(32, 32),
                                        seed=0)
    assert train_engine.mesh is not None \
        and train_engine.mesh.devices.size == 8
    best = train_engine.train()
    assert np.isfinite(best), best

    # --- partial global batch must NOT desynchronize processes ---
    # 3 rows/process -> global 6 rows over an 8-device mesh (6 % 8 != 0):
    # shard_batch pads each process shard to the per-process device count
    # and still assembles a GLOBAL array. Before that fix the batch stayed
    # a process-local numpy array that jit assumed replicated — different
    # data per process, no gradient all-reduce, silently diverging params.
    pb_cfg = graft.tiny_entropic_student_config(3)
    pb_cfg['train']['train_data_loader']['dataset']['kwargs'][
        'num_samples'] = 6
    pb_cfg['train']['train_data_loader']['drop_last'] = False
    pb_engine = ClassificationEngine(pb_cfg, image_size=(32, 32), seed=0)
    assert np.isfinite(pb_engine.train())
    from jax.experimental import multihost_utils
    local_sum = np.float64(0)
    for leaf in jax.tree.leaves(jax.device_get(
            pb_engine.student_variables['params'])):
        local_sum += np.asarray(leaf, np.float64).sum()
    sums = np.asarray(multihost_utils.process_allgather(
        jax.numpy.asarray(local_sum)))
    assert np.all(sums == sums[0]), ('params desynchronized', sums)
    print(f'ENGINE_CHILD_{pid}_OK')
""")


@pytest.mark.slow
def test_two_process_engine_evaluate():
    """2 processes x 4 CPU devices driving `ClassificationEngine.evaluate`
    and the COCO evaluator through per-process dataset shards: synced
    metrics must equal a full-dataset run (VERDICT r2 item 8 — closes the
    gap between gather-unit tests and the engine path)."""
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=4')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
    env['PYTHONPATH'] = str(REPO) + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, '-c', ENGINE_CHILD, str(pid), port],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out[-3000:]}'
        assert f'ENGINE_CHILD_{pid}_OK' in out
