"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP/DP over NCCL
(SURVEY.md §2.4). The TPU-native equivalent: a 1-D `Mesh(devices, ('data',))`
with batch sharded over 'data' and parameters replicated; XLA inserts the
gradient all-reduce (psum) over ICI during pjit autodiff — no user-visible
collectives. Multi-host extends the same mesh across processes via
`jax.distributed.initialize()` (reference's `init_distributed_mode`,
SURVEY.md §5.8).

An optional 2-D ('data', 'model') mesh supports within-batch spatial/channel
sharding of the conv encoder for very large inputs (SURVEY.md §5.7's
nice-to-have) — exercised by `dryrun_multichip`.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axes=('data',),
             local: bool = False) -> Mesh:
    """Build a mesh over the first `n_devices` devices (default: all).
    `local=True` restricts to this process's addressable devices — the
    right mesh for eval in a multi-process job, where each process scores
    its own dataset shard and cross-process reduction happens in the
    metric sync (the reference's DDP eval contract, SURVEY.md §2.4)."""
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axes) == 1:
        return Mesh(np.asarray(devices), axes)
    # 2-D: put as many devices as possible on 'data'
    n = len(devices)
    model = 1
    for cand in (2, 4):
        if n % cand == 0 and n // cand >= 1:
            model = cand
    return Mesh(np.asarray(devices).reshape(n // model, model), axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for NHWC (or any leading-batch) arrays."""
    return NamedSharding(mesh, P('data'))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def sync_metric(x, mesh: Mesh | None = None):
    """Sum a metric across all devices of the mesh — the reference's
    `dist.all_reduce` (`script/task/utils/eval.py:28-34`). `x` is an array
    whose leading dim is sharded over 'data' (e.g. one partial value per
    device); returns the replicated global sum, computed by a real psum
    over the mesh via shard_map."""
    import jax.numpy as jnp
    from jax import shard_map
    mesh = mesh or get_mesh()
    x = jnp.asarray(x)
    if mesh.devices.size == 1:
        return jnp.sum(x)
    x = jax.device_put(x, data_sharding(mesh))
    f = shard_map(lambda v: jax.lax.psum(jnp.sum(v), 'data'),
                  mesh=mesh, in_specs=P('data'), out_specs=P())
    return jax.jit(f)(x)
