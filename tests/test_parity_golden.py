"""Numeric parity of the entropy stack against the pure-torch CompressAI
golden oracle (`sc2bench_tpu/utils/torch_golden.py`).

This is the offline pin for BASELINE.md's ±0.1% bpp/top-1 target: the
production JAX/numpy stack must produce bit-identical quantized CDF tables,
bit-identical symbols, identical bitstream bytes, and likelihoods within
1e-6 of the torch replica of CompressAI's algorithms (reference call sites:
`/root/reference/sc2bench/models/layer.py:388-398,698-720`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from sc2bench_tpu.ops.entropy.factorized import EntropyBottleneck
from sc2bench_tpu.ops.entropy.gaussian import (GaussianConditional,
                                               get_scale_table)
from sc2bench_tpu.ops.entropy.tables import (build_factorized_tables,
                                             build_gaussian_tables)
from sc2bench_tpu.ops.math import pmf_to_quantized_cdf
from sc2bench_tpu.utils.torch_golden import (GoldenEntropyBottleneck,
                                             GoldenGaussianConditional,
                                             golden_pmf_to_quantized_cdf)

CHANNELS = 24


@pytest.fixture(scope='module')
def eb_pair():
    """A flax EntropyBottleneck with 'trained-ish' params and the golden
    torch bottleneck loaded with the identical weights."""
    eb = EntropyBottleneck(channels=CHANNELS)
    x = jnp.zeros((1, 4, 4, CHANNELS))
    variables = eb.init({'params': jax.random.key(0),
                         'noise': jax.random.key(1)}, x)
    params = jax.device_get(variables['params'])
    # perturb deterministically so tables aren't the symmetric init
    rng = np.random.default_rng(42)
    params = jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        + rng.normal(0, 0.05, a.shape).astype(np.float32), params)
    # spread quantiles so per-channel pmf supports differ
    q = np.asarray(params['quantiles'], np.float32)
    q[:, 0, 0] -= rng.uniform(0, 4, CHANNELS).astype(np.float32)
    q[:, 0, 1] += rng.uniform(-1, 1, CHANNELS).astype(np.float32)
    q[:, 0, 2] += rng.uniform(0, 4, CHANNELS).astype(np.float32)
    params['quantiles'] = q
    golden = GoldenEntropyBottleneck(CHANNELS).load_numpy_params(params)
    return eb, params, golden


def test_pmf_to_quantized_cdf_bit_identical():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(2, 64))
        pmf = rng.dirichlet(np.full(n, 0.3)).astype(np.float32)
        # scale down so a tail mass exists and some entries underflow
        pmf = pmf * np.float32(rng.uniform(0.2, 1.0))
        tail = np.float32(max(1.0 - pmf.sum(), 1e-9))
        prob = np.concatenate([pmf, [tail]])
        ours = pmf_to_quantized_cdf(prob, 16)
        golden = golden_pmf_to_quantized_cdf(torch.from_numpy(prob), 16)
        np.testing.assert_array_equal(ours, golden.numpy())


def test_factorized_tables_bit_identical(eb_pair):
    eb, params, golden = eb_pair
    tables = build_factorized_tables(eb, {'params': params})
    g_cdf, g_len, g_off, g_med = golden.update()
    np.testing.assert_array_equal(tables.quantized_cdf, g_cdf)
    np.testing.assert_array_equal(tables.cdf_length, g_len)
    np.testing.assert_array_equal(tables.offset, g_off)
    np.testing.assert_allclose(tables.medians, g_med, atol=0)


def test_factorized_symbols_and_likelihood(eb_pair):
    eb, params, golden = eb_pair
    rng = np.random.default_rng(3)
    x = rng.normal(0, 3, (2, 8, 8, CHANNELS)).astype(np.float32)

    # symbols: round(x - median) must match bit-for-bit
    medians = np.asarray(params['quantiles'], np.float32)[:, 0, 1]
    ours_sym = np.asarray(jnp.round(jnp.asarray(x) - medians)).astype(np.int32)
    xt = torch.from_numpy(x).reshape(-1, CHANNELS).T[:, None, :]
    med_t = torch.from_numpy(medians)[:, None, None]
    golden_sym = golden.quantize(xt, 'symbols', med_t).numpy()
    np.testing.assert_array_equal(
        ours_sym.reshape(-1, CHANNELS).T[:, None, :], golden_sym)

    # dequantize-mode forward likelihoods within 1e-6
    y_hat, like = eb.apply({'params': params}, jnp.asarray(x),
                           mode='dequantize')
    golden_like = golden.likelihood_nhwc(np.asarray(y_hat))
    np.testing.assert_allclose(np.asarray(like), golden_like,
                               rtol=0, atol=1e-6)


def test_factorized_bitstream_bytes_identical(eb_pair):
    """Encoding the same symbols with our tables vs the golden tables must
    produce identical bitstream bytes (tables are bit-identical, and the
    rANS coder implements the CompressAI bitstream format)."""
    from sc2bench_tpu.ops.rans import encode_with_indexes
    eb, params, golden = eb_pair
    tables = build_factorized_tables(eb, {'params': params})
    g_cdf, g_len, g_off, g_med = golden.update()
    rng = np.random.default_rng(5)
    x = rng.normal(0, 2, (1, 8, 8, CHANNELS)).astype(np.float32)
    sym = np.round(x - tables.medians).astype(np.int32)
    # CompressAI flattens channels-leading with per-channel cdf rows
    sym_cl = sym.reshape(-1, CHANNELS).T.reshape(-1)
    idx = np.repeat(np.arange(CHANNELS, dtype=np.int32), sym_cl.size // CHANNELS)
    ours = encode_with_indexes(sym_cl, idx, tables.quantized_cdf,
                               tables.cdf_length, tables.offset)
    theirs = encode_with_indexes(sym_cl, idx, g_cdf, g_len, g_off)
    assert ours == theirs and len(ours) > 0


def test_gaussian_tables_bit_identical():
    gc = GaussianConditional()
    tables = build_gaussian_tables(get_scale_table())
    golden = GoldenGaussianConditional()
    g_cdf, g_len, g_off, g_scales = golden.update()
    np.testing.assert_array_equal(tables.quantized_cdf, g_cdf)
    np.testing.assert_array_equal(tables.cdf_length, g_len)
    np.testing.assert_array_equal(tables.offset, g_off)
    np.testing.assert_allclose(tables.scale_table, g_scales, rtol=1e-6)
    del gc


def test_gaussian_indexes_and_likelihood():
    gc = GaussianConditional()
    golden = GoldenGaussianConditional()
    table = get_scale_table()
    rng = np.random.default_rng(7)
    scales = np.exp(rng.uniform(np.log(0.05), np.log(300),
                                (4, 6, 6, 8))).astype(np.float32)
    ours_idx = np.asarray(gc.build_indexes(jnp.asarray(scales), table))
    golden_idx = golden.build_indexes(scales)
    np.testing.assert_array_equal(ours_idx, golden_idx)

    x = rng.normal(0, 3, scales.shape).astype(np.float32)
    y_hat = np.round(x)
    ours_like = np.asarray(gc.likelihood(jnp.asarray(y_hat),
                                         jnp.asarray(scales)))
    golden_like = golden.likelihood(y_hat, scales)
    np.testing.assert_allclose(ours_like, np.maximum(golden_like, 1e-9),
                               rtol=0, atol=1e-6)
