"""Entropy-model unit tests: CDF correctness, likelihoods vs closed form,
table build, and bit-exact encode→decode through the full stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc2bench_tpu.ops.entropy.factorized import EntropyBottleneck
from sc2bench_tpu.ops.entropy.gaussian import (
    GaussianConditional, get_scale_table)
from sc2bench_tpu.ops.entropy.tables import (
    build_factorized_tables, build_gaussian_tables)
from sc2bench_tpu.ops.math import lower_bound
from sc2bench_tpu.ops.rans.coder import RansCoder


def test_lower_bound_gradient_semantics():
    g = jax.grad(lambda x: lower_bound(x, 1.0))
    assert g(2.0) == 1.0           # above bound: identity
    assert g(0.5) == 0.0           # below bound, grad pushes down: blocked
    g_neg = jax.grad(lambda x: -lower_bound(x, 1.0))
    assert g_neg(0.5) == -1.0      # below bound, grad pushes up: passes


class TestEntropyBottleneck:
    @pytest.fixture(scope='class')
    def eb(self):
        eb = EntropyBottleneck(channels=8)
        variables = eb.init(
            {'params': jax.random.key(0), 'noise': jax.random.key(1)},
            jnp.zeros((1, 4, 4, 8)), mode='noise')
        return eb, variables

    def test_likelihood_is_valid_pmf(self, eb):
        """sum over integer support of P(y) must be ~1 per channel."""
        model, variables = eb
        support = jnp.arange(-300, 301, dtype=jnp.float32)
        x = jnp.tile(support[None, :, None, None], (1, 1, 1, 8))
        _, lik = model.apply(variables, x, mode='dequantize')
        totals = jnp.sum(lik[0, :, 0, :], axis=0)
        np.testing.assert_allclose(np.asarray(totals), 1.0, atol=1e-2)
        # and the CDF difference across the same interval agrees with the sum
        logits = model.apply(
            variables, jnp.broadcast_to(jnp.asarray([[[-300.5]], [[300.5]]]),
                                        (2, 1, 1)).transpose(1, 2, 0)
            * jnp.ones((8, 1, 2)), method=model.logits_cumulative)
        cdf_span = jax.nn.sigmoid(logits[:, 0, 1]) - jax.nn.sigmoid(
            logits[:, 0, 0])
        np.testing.assert_allclose(np.asarray(totals), np.asarray(cdf_span),
                                   atol=1e-3)

    def test_noise_mode_bounds(self, eb):
        model, variables = eb
        x = jax.random.normal(jax.random.key(2), (2, 4, 4, 8)) * 3
        y_hat, lik = model.apply(variables, x, mode='noise',
                                 rngs={'noise': jax.random.key(3)})
        assert jnp.all(jnp.abs(y_hat - x) <= 0.5)
        assert jnp.all(lik > 0) and jnp.all(lik <= 1.0 + 1e-6)

    def test_dequantize_mode_integers_around_medians(self, eb):
        model, variables = eb
        x = jax.random.normal(jax.random.key(4), (2, 4, 4, 8)) * 3
        y_hat, _ = model.apply(variables, x, mode='dequantize')
        medians = np.asarray(variables['params']['quantiles'][:, 0, 1])
        resid = np.asarray(y_hat) - medians
        np.testing.assert_allclose(resid, np.round(resid), atol=1e-5)

    def test_aux_loss_trains_quantiles_only(self, eb):
        model, variables = eb
        grads = jax.grad(
            lambda p: model.apply({'params': p}, method=model.aux_loss)
        )(variables['params'])
        assert float(jnp.abs(grads['quantiles']).sum()) > 0
        for k, v in grads.items():
            if k != 'quantiles':
                assert float(jnp.abs(v).sum()) == 0.0, k

    def test_roundtrip_through_rans(self, eb):
        model, variables = eb
        tables = build_factorized_tables(model, variables)
        coder = RansCoder(tables.quantized_cdf, tables.cdf_length,
                          tables.offset)
        x = jax.random.normal(jax.random.key(5), (1, 6, 6, 8)) * 2
        medians = tables.medians
        symbols = np.asarray(jnp.round(x - medians)).astype(np.int32)
        c = symbols.shape[-1]
        # channelwise index: each channel uses its own CDF row
        indexes = np.broadcast_to(np.arange(c, dtype=np.int32), symbols.shape)
        data = coder.encode_with_indexes(symbols.ravel(), indexes.ravel())
        decoded = coder.decode_with_indexes(data, indexes.ravel())
        np.testing.assert_array_equal(decoded, symbols.ravel())
        # reconstruction matches dequantize mode exactly
        y_hat = decoded.reshape(symbols.shape) + medians
        ref, _ = model.apply(variables, x, mode='dequantize')
        np.testing.assert_allclose(y_hat, np.asarray(ref), atol=1e-5)

    def test_coded_size_matches_likelihood_bits(self, eb):
        """-log2(likelihood) should predict the actual coded size closely
        (this is the bpp == data-size contract the benchmark relies on)."""
        model, variables = eb
        tables = build_factorized_tables(model, variables)
        coder = RansCoder(tables.quantized_cdf, tables.cdf_length,
                          tables.offset)
        x = jax.random.normal(jax.random.key(6), (1, 16, 16, 8)) * 2
        _, lik = model.apply(variables, x, mode='dequantize')
        est_bits = float(-jnp.sum(jnp.log2(lik)))
        symbols = np.asarray(jnp.round(x - tables.medians)).astype(np.int32)
        indexes = np.broadcast_to(
            np.arange(8, dtype=np.int32), symbols.shape)
        data = coder.encode_with_indexes(symbols.ravel(), indexes.ravel())
        actual_bits = len(data) * 8
        assert abs(actual_bits - est_bits) / max(est_bits, 1) < 0.10


class TestGaussianConditional:
    def test_likelihood_closed_form(self):
        gc = GaussianConditional()
        from scipy.stats import norm
        x = jnp.asarray([0.0, 1.0, -2.0, 3.5])
        scales = jnp.asarray([1.0, 0.5, 2.0, 1.5])
        lik = np.asarray(gc.likelihood(x, scales))
        ref = norm.cdf(0.5, np.abs(np.asarray(x)), np.asarray(scales)) \
            - norm.cdf(-0.5, np.abs(np.asarray(x)), np.asarray(scales))
        np.testing.assert_allclose(lik, ref, rtol=1e-5)

    def test_scale_lower_bound_applied(self):
        gc = GaussianConditional()
        lik_small = gc.likelihood(jnp.asarray([0.0]), jnp.asarray([1e-9]))
        lik_bound = gc.likelihood(jnp.asarray([0.0]), jnp.asarray([0.11]))
        np.testing.assert_allclose(np.asarray(lik_small),
                                   np.asarray(lik_bound), rtol=1e-6)

    def test_build_indexes(self):
        gc = GaussianConditional()
        table = get_scale_table()
        scales = jnp.asarray([0.05, 0.11, 0.2, 1.0, 100.0, 300.0])
        idx = np.asarray(gc.build_indexes(scales, table))
        assert idx[0] == 0 and idx[-1] == len(table) - 1
        # each scale must lie within its assigned bucket
        for s, i in zip(np.asarray(scales), idx):
            s_eff = max(s, 0.11)
            if i > 0:
                assert s_eff > table[i - 1]
            assert s_eff <= table[i] or i == len(table) - 1

    def test_roundtrip_through_rans(self):
        gc = GaussianConditional()
        table = get_scale_table()
        tables = build_gaussian_tables(table)
        coder = RansCoder(tables.quantized_cdf, tables.cdf_length,
                          tables.offset)
        rng = jax.random.key(7)
        k1, k2, k3 = jax.random.split(rng, 3)
        scales = jnp.exp(jax.random.uniform(k1, (5000,), minval=-2.0,
                                            maxval=3.0))
        means = jax.random.normal(k2, (5000,))
        y = means + scales * jax.random.normal(k3, (5000,))
        indexes = np.asarray(gc.build_indexes(scales, table))
        symbols = np.asarray(jnp.round(y - means)).astype(np.int32)
        data = coder.encode_with_indexes(symbols, indexes)
        decoded = coder.decode_with_indexes(data, indexes)
        np.testing.assert_array_equal(decoded, symbols)
        # size tracks the likelihood estimate
        lik = gc.likelihood(jnp.round(y - means), scales)
        est_bits = float(-jnp.sum(jnp.log2(lik)))
        assert abs(len(data) * 8 - est_bits) / est_bits < 0.05
