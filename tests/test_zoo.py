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


def _jahp_nonvacuous(n=8, m=8, seed=0):
    """Zero-init biases make a fresh JAHP's hyper/means/scales EXACTLY
    zero (everything quantizes to 0 symbols -> a vacuous round trip):
    randomize every bias and calibrate the scale half of the
    entropy-parameters output so the wire carries real entropy."""
    import flax
    from sc2bench_tpu.models.zoo_jahp import (JointAutoregressiveCodec,
                                              JointAutoregressiveRuntime)
    module = JointAutoregressiveCodec(n=n, m=m)
    variables = _init(module, (1, 64, 64, 3))
    params = flax.core.unfreeze(variables['params'])
    rng = np.random.default_rng(seed)

    def bump(tree):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                bump(sub)
            elif k == 'bias':
                tree[k] = jnp.asarray(rng.normal(0, 0.2, sub.shape),
                                      jnp.float32)
    bump(params)
    b = np.asarray(params['ep2']['bias']).copy()
    b[:m] = 4.0
    params['ep2']['bias'] = jnp.asarray(b)
    rt = JointAutoregressiveRuntime(
        module, {'params': params,
                 'batch_stats': variables['batch_stats']})
    rt.update()
    return rt


def test_jahp_device_wavefront_wire_roundtrip():
    """TPU-native JAHP wire (zoo_jahp_device.py, VERDICT r4 item 4): the
    fused encode program's y_hat must be rebuilt EXACTLY by the fused
    decode program (bit-exact context-model sync through the masked
    lane-rANS), validity must certify every lane, and the decoded image
    must agree with the host wavefront path."""
    rt = _jahp_nonvacuous()
    x = jax.random.uniform(jax.random.key(3), (1, 64, 64, 3)) * 2.0

    ops = rt.encode_device_wire(x)
    ok, nbytes = (int(v) for v in np.asarray(ops['meta']))
    assert ok == 1 and nbytes > 0
    assert int(np.asarray(ops['y_lengths']).sum()) > 0  # non-vacuous
    img, valid = rt.decode_device_wire(ops)
    assert bool(np.asarray(valid))
    # bit-exact round trip: decode-side y_hat == encode-side y_hat
    np.testing.assert_array_equal(
        np.asarray(rt._last_y_hat_dec_device),
        np.asarray(ops['y_hat']))
    # cross-check vs the host wavefront path (same weights, same input;
    # numpy vs XLA matmul order can differ by float ulps, so symbols may
    # flip on exact .5 boundaries — compare reconstructions, not bits)
    host = rt.decompress(**rt.compress(x))
    np.testing.assert_allclose(np.asarray(img), np.asarray(host),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ops['y_hat']),
                               rt._last_y_hat, rtol=1e-3, atol=1e-3)


def test_jahp_device_wire_rejects_corrupt_stream():
    """Flipping one renorm chunk must fail the per-lane validity check
    (the serving loop's host-fallback trigger) rather than return
    garbage silently."""
    rt = _jahp_nonvacuous(seed=5)
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3)) * 2.0
    ops = rt.encode_device_wire(x)
    streams = np.asarray(ops['y_streams']).copy()
    lengths = np.asarray(ops['y_lengths'])
    lane = int(np.argmax(lengths))
    assert lengths[lane] > 0
    col = int(np.nonzero(streams[lane])[0][0]) \
        if streams[lane].any() else 0
    streams[lane, col] ^= 0x5A5A
    ops['y_streams'] = jnp.asarray(streams)
    _, valid = rt.decode_device_wire(ops)
    assert not bool(np.asarray(valid))


def test_jahp_device_wire_non_multiple_of_16():
    """H/W not divisible by 16 must code the FULL ceil-chain latent:
    the floor-derived front grid silently cropped y (72x72 -> a 4x4
    crop of the true 5x5 latent) and decoded a smaller image with
    valid=True. The encode program now sizes fronts with ceil and
    asserts coverage against the traced latent at trace time."""
    rt = _jahp_nonvacuous(seed=7)
    x = jax.random.uniform(jax.random.key(7), (1, 72, 72, 3)) * 2.0
    ops = rt.encode_device_wire(x)
    assert tuple(ops['shape']) == (5, 5)   # ceil(72/16), not 72//16
    ok, nbytes = (int(v) for v in np.asarray(ops['meta']))
    assert ok == 1 and nbytes > 0
    img, valid = rt.decode_device_wire(ops)
    assert bool(np.asarray(valid))
    # g_s upsamples the 5x5 latent 16x (the host path instead
    # AdaptivePads the INPUT to its stride multiple before coding —
    # a different, wrapper-level shape policy — so the meaningful
    # check here is the wire's own bit-exact context-model sync)
    assert np.asarray(img).shape == (1, 80, 80, 3)
    np.testing.assert_array_equal(
        np.asarray(rt._last_y_hat_dec_device),
        np.asarray(ops['y_hat']))
