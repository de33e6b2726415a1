"""Multi-chip serving pool: round-robin batch-1 deploy across the local
devices, per-image outputs identical to single-chip serving."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sc2bench_tpu.models.backbone import SplittableResNet
from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
from sc2bench_tpu.models.runtime import SplitClassifierRuntime
from sc2bench_tpu.models.serving_pool import ServingPool

pytestmark = pytest.mark.slow  # compiles per-device deploy programs


@pytest.fixture(scope='module')
def model_and_vars():
    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=64),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    return model, {'params': v['params'],
                   'batch_stats': v.get('batch_stats', {})}


@pytest.mark.parametrize('wire', ['host', 'device'])
def test_pool_matches_single_chip(model_and_vars, wire):
    model, variables = model_and_vars
    assert jax.device_count() >= 4
    single = SplitClassifierRuntime(model, variables)
    single.update()
    single.eval()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(6)]
    expected = [np.asarray(single(x)) for x in imgs]

    pool = ServingPool(
        lambda v: SplitClassifierRuntime(model, v), variables,
        devices=jax.local_devices()[:4], wire=wire)
    pool.activate_analysis()
    got = pool.stream(imgs, depth=2, workers=2)
    for e, g in zip(expected, got):
        np.testing.assert_allclose(e, np.asarray(g), rtol=2e-5, atol=2e-5)
    summary = pool.summarize()
    assert summary['num_samples'] == len(imgs)
    assert summary['mean'] > 0


def test_pool_device_wire_batch_matches_single_chip(model_and_vars):
    """`wire_batch=k` through the pool: per-replica grouped dispatches,
    per-image outputs and pooled accounting identical to single-chip
    serving; requesting it on the host wire is rejected."""
    model, variables = model_and_vars
    single = SplitClassifierRuntime(model, variables)
    single.update()
    single.eval()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(6)]
    expected = [np.asarray(single(x)) for x in imgs]

    pool = ServingPool(
        lambda v: SplitClassifierRuntime(model, v), variables,
        devices=jax.local_devices()[:2], wire='device')
    pool.activate_analysis()
    got = pool.stream(imgs, depth=2, workers=2, wire_batch=2)
    for e, g in zip(expected, got):
        np.testing.assert_allclose(e, np.asarray(g), rtol=2e-5, atol=2e-5)
    assert pool.summarize()['num_samples'] == len(imgs)

    host_pool = ServingPool(
        lambda v: SplitClassifierRuntime(model, v), variables,
        devices=jax.local_devices()[:1], wire='host')
    with pytest.raises(ValueError):
        host_pool.stream(imgs, wire_batch=2)
