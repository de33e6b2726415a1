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
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out[-3000:]}'
        assert f'CHILD_{pid}_OK' in out
