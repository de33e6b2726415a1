"""Image-codec zoo tests: FP/SHP/MSHP compress↔decompress consistency and
the joint-autoregressive (mbt2018) serial round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile-bound module (CPU mesh)


def _init(module, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape)
    variables = jax.jit(lambda r, x: module.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    return {'params': variables['params'],
            'batch_stats': variables.get('batch_stats', {})}


@pytest.mark.parametrize('key', ['factorized_prior', 'scale_hyperprior',
                                 'mean_scale_hyperprior'])
def test_image_codec_roundtrip(key):
    from sc2bench_tpu.models.zoo import ImageCodecRuntime
    from sc2bench_tpu.registry import get as rget
    module = rget('model', key)(n=8, m=12)
    variables = _init(module)
    rt = ImageCodecRuntime(module, variables)
    rt.update()
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    compressed = rt.compress(x)
    assert 'strings' in compressed and 'shape' in compressed
    x_hat = rt.decompress(**compressed)
    assert x_hat.shape == x.shape
    # deterministic
    x_hat2 = rt.decompress(**compressed)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))


def test_joint_autoregressive_roundtrip():
    from sc2bench_tpu.models.zoo_jahp import (JointAutoregressiveCodec,
                                              JointAutoregressiveRuntime)
    module = JointAutoregressiveCodec(n=6, m=6)
    variables = _init(module, (1, 64, 64, 3))
    rt = JointAutoregressiveRuntime(module, variables)
    rt.update()
    x = jax.random.uniform(jax.random.key(3), (1, 64, 64, 3))
    compressed = rt.compress(x)
    x_hat = rt.decompress(**compressed)
    assert x_hat.shape == x.shape
    # serial decode must rebuild the exact encoder-side y_hat (context
    # model sync contract)
    np.testing.assert_allclose(rt._last_y_hat_dec, rt._last_y_hat,
                               rtol=1e-5, atol=1e-5)


def test_jahp_train_forward():
    from sc2bench_tpu.models.zoo_jahp import JointAutoregressiveCodec
    module = JointAutoregressiveCodec(n=6, m=6)
    variables = _init(module, (1, 64, 64, 3))
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
    out, state = module.apply(variables, x, mode='train',
                              rngs={'noise': jax.random.key(5)},
                              mutable=['entropy'])
    assert out.shape == x.shape
    (_, z_lik), = state['entropy']['eb_out']
    (_, y_lik), = state['entropy']['gc_out']
    assert jnp.all(z_lik > 0) and jnp.all(y_lik > 0)
