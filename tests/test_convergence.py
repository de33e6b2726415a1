"""Learning-dynamics tests: gradients through the entropy model must drive
bpp toward the source's analytic entropy, and the aux loss must place the
quantiles at the learned tails — the core training contracts behind every
supervised-compression recipe."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sc2bench_tpu.ops.entropy.factorized import EntropyBottleneck
from sc2bench_tpu.train.box import factorized_aux_loss


@pytest.mark.slow
def test_entropy_bottleneck_learns_source_entropy():
    """Train the factorized prior on iid N(0, sigma^2) data: the rate must
    approach the analytic entropy of the quantized Gaussian and the coded
    size must match it."""
    channels = 4
    sigmas = jnp.asarray([0.8, 2.0, 5.0, 10.0])
    eb = EntropyBottleneck(channels=channels)
    variables = eb.init({'params': jax.random.key(0),
                         'noise': jax.random.key(1)},
                        jnp.zeros((8, 8, 8, channels)), mode='noise')
    params = variables['params']
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        r1, r2 = jax.random.split(rng)
        x = jax.random.normal(r1, (16, 8, 8, channels)) * sigmas

        def loss_fn(p):
            _, lik = eb.apply({'params': p}, x, mode='noise',
                              rngs={'noise': r2})
            bits = -jnp.sum(jnp.log2(lik)) / x.size * channels
            return bits / channels + factorized_aux_loss({'eb': p}) * 1e-3

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(2)
    losses = []
    for i in range(400):
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, srng)
        losses.append(float(loss))

    # analytic entropy of unit-bin-quantized N(0, s^2):
    # ~= 0.5*log2(2*pi*e*s^2) for s >> bin width
    analytic = float(np.mean(
        0.5 * np.log2(2 * np.pi * np.e * np.asarray(sigmas) ** 2)))
    x = jax.random.normal(jax.random.key(3), (4, 16, 16, channels)) * sigmas
    _, lik = eb.apply({'params': params}, x, mode='dequantize')
    bits_per_symbol = float(-jnp.sum(jnp.log2(lik)) / lik.size)
    # trained rate within 10% of the source entropy (and way below init)
    assert bits_per_symbol < analytic * 1.10, \
        (bits_per_symbol, analytic, losses[:3], losses[-3:])
    assert losses[-1] < losses[0] * 0.8

    # the real coded size agrees too
    from sc2bench_tpu.ops.entropy.tables import build_factorized_tables
    from sc2bench_tpu.ops.rans.coder import RansCoder
    tables = build_factorized_tables(eb, {'params': params})
    coder = RansCoder(tables.quantized_cdf, tables.cdf_length, tables.offset)
    symbols = np.asarray(jnp.round(x - tables.medians)).astype(np.int32)
    sym_cm = np.transpose(symbols.reshape(-1, channels))
    indexes = np.repeat(np.arange(channels, dtype=np.int32),
                        sym_cm.shape[1])
    data = coder.encode_with_indexes(sym_cm.ravel(), indexes)
    actual_bits = len(data) * 8 / symbols.size
    assert abs(actual_bits - bits_per_symbol) / bits_per_symbol < 0.08


@pytest.mark.slow
def test_image_codec_rate_distortion_training():
    """Train a tiny factorized-prior image codec on smooth synthetic images
    with an MSE+rate objective: distortion must drop substantially while the
    rate stays finite — the end-to-end trainability contract behind the
    neural input-compression family."""
    from sc2bench_tpu.models.zoo import FactorizedPriorCodec
    module = FactorizedPriorCodec(n=8, m=8)

    def make_batch(rng_np, n=8, size=32):
        # smooth random images: low-frequency mixtures
        xs = []
        for _ in range(n):
            freq = rng_np.uniform(0.5, 2.0, (2,))
            phase = rng_np.uniform(0, 2 * np.pi, (2,))
            yy, xx = np.mgrid[0:size, 0:size] / size
            img = 0.5 + 0.25 * np.sin(2 * np.pi * freq[0] * yy + phase[0]) \
                * np.cos(2 * np.pi * freq[1] * xx + phase[1])
            xs.append(np.stack([img] * 3, -1))
        return jnp.asarray(np.stack(xs), jnp.float32)

    rng_np = np.random.default_rng(0)
    x0 = make_batch(rng_np)
    variables = module.init(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)},
        x0, mode='train')
    params = variables['params']
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(p):
            x_hat, state = module.apply(
                {'params': p}, x, mode='train', rngs={'noise': rng},
                mutable=['entropy'])
            (_, lik), = state['entropy']['eb_out']
            n_pix = x.shape[0] * x.shape[1] * x.shape[2]
            bpp = -jnp.sum(jnp.log2(lik)) / n_pix
            mse = jnp.mean((x_hat - x) ** 2)
            return 255 ** 2 * 0.01 * mse + 0.1 * bpp \
                + 1e-3 * factorized_aux_loss(p), (mse, bpp)
        (loss, (mse, bpp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, mse, bpp

    rng = jax.random.key(2)
    first_mse = None
    for i in range(300):
        rng, srng, drng = jax.random.split(rng, 3)
        x = make_batch(rng_np)
        params, opt_state, mse, bpp = step(params, opt_state, x, srng)
        if first_mse is None:
            first_mse = float(mse)
    assert float(mse) < first_mse * 0.5, (first_mse, float(mse))
    assert 0 < float(bpp) < 24.0
    # deploy round trip still works after training
    from sc2bench_tpu.models.zoo import ImageCodecRuntime
    rt = ImageCodecRuntime(module, {'params': params, 'batch_stats': {}})
    rt.update()
    compressed = rt.compress(x0[:1])
    x_hat = rt.decompress(**compressed)
    assert x_hat.shape == (1, 32, 32, 3)
    psnr = -10 * np.log10(float(jnp.mean((x_hat - x0[:1]) ** 2)) + 1e-12)
    assert psnr > 18.0, psnr


@pytest.mark.slow
def test_gaussian_conditional_gradients_reduce_rate():
    """SHP-style training signal: gradients through the GaussianConditional
    must let the hyper-path shrink the y rate below the no-context
    (max-scale) rate."""
    from sc2bench_tpu.models.layer import SHPBasedResNetBottleneck
    module = SHPBasedResNetBottleneck(num_latent_channels=4,
                                      num_bottleneck_channels=8,
                                      num_target_channels=32)
    x0 = jnp.zeros((4, 32, 32, 3))
    variables = module.init(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)},
        x0, mode='train')
    params = variables['params']
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def rate(p, x, rng):
        _, state = module.apply({'params': p}, x, mode='train',
                                rngs={'noise': rng}, mutable=['entropy'])
        (_, z_lik), = state['entropy']['eb_out']
        (_, y_lik), = state['entropy']['gc_out']
        return (-jnp.sum(jnp.log2(y_lik)) - jnp.sum(jnp.log2(z_lik))) \
            / x.shape[0]

    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(p):
            return rate(p, x, rng) + 1e-3 * factorized_aux_loss(p)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(2)
    x = jax.random.normal(jax.random.key(3), (4, 32, 32, 3))
    first = None
    for i in range(150):
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, x, srng)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.8, (first, float(loss))
