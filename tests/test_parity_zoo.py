"""CompressAI-zoo codec cross-framework parity: torch zoo replicas
(bmshj2018_factorized / bmshj2018_hyperprior / mbt2018_mean — the
reference's neural input-compression baselines, resolved from
compressai.zoo at `/root/reference/sc2bench/models/registry.py:12-80`)
vs the JAX `models/zoo.py` codecs with CONVERTED weights, through
g_a → entropy tables → rANS bitstream(s) → g_s.

Pins `ZOO_FACTORIZED_RULES`/`ZOO_HYPERPRIOR_RULES`: (a) coding tables
rebuilt from converted weights bit-for-bit, (b) per-image y (and z)
bitstream BYTES exactly, (c) reconstructed images to float tolerance.
Mirrors what `test_parity_full_model.py` does for the splittable
families.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.slow  # full-codec compiles (torch + jit programs)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.models.zoo import (  # noqa: E402
    FactorizedPriorCodec, ImageCodecRuntime, ScaleHyperpriorCodec)
from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    ZOO_FACTORIZED_DECONV_PATHS, ZOO_FACTORIZED_RULES,
    ZOO_HYPERPRIOR_DECONV_PATHS, ZOO_HYPERPRIOR_RULES, convert_state_dict,
    merge_into_variables)
from sc2bench_tpu.utils.torch_ref_model import (  # noqa: E402
    TorchZooFactorizedPrior, TorchZooMeanScaleHyperprior,
    TorchZooScaleHyperprior, randomize_for_parity,
    torch_deploy_forward_zoo_fp, torch_deploy_forward_zoo_hyper)

N, M, HW = 8, 12, 64


def _images(n=3):
    rng = np.random.default_rng(17)
    return [rng.uniform(0, 1, (1, HW, HW, 3)).astype(np.float32)
            for _ in range(n)]


def _runtime(module, tm, rules, deconv_paths):
    x0 = jnp.zeros((1, HW, HW, 3))
    variables = jax.jit(lambda r, x: module.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(tm.state_dict(), rules,
                                   deconv_paths=deconv_paths)
    variables = merge_into_variables(variables, converted)
    rt = ImageCodecRuntime(module, variables)
    assert rt.update()
    return rt


@pytest.fixture(scope='module')
def fp_pipelines():
    from sc2bench_tpu.ops.rans.coder import RansCoder
    tm = randomize_for_parity(TorchZooFactorizedPrior(n=N, m=M), seed=21)
    cdf, cdf_len, offset, medians = tm.entropy_bottleneck.update()
    coder = RansCoder(cdf, cdf_len, offset)
    rt = _runtime(FactorizedPriorCodec(n=N, m=M), tm,
                  ZOO_FACTORIZED_RULES, ZOO_FACTORIZED_DECONV_PATHS)
    return tm, (coder, cdf, cdf_len, offset, medians), rt


def test_zoo_factorized_tables_bit_identical(fp_pipelines):
    _, (_, cdf, cdf_len, offset, medians), rt = fp_pipelines
    np.testing.assert_array_equal(rt.codec.tables.quantized_cdf, cdf)
    np.testing.assert_array_equal(rt.codec.tables.cdf_length, cdf_len)
    np.testing.assert_array_equal(rt.codec.tables.offset, offset)
    np.testing.assert_allclose(rt.codec.tables.medians, medians,
                               rtol=0, atol=1e-6)


def test_zoo_factorized_bitstreams_and_recon_match(fp_pipelines):
    tm, (coder, *_rest, medians), rt = fp_pipelines
    for img in _images():
        t_xhat, t_bits = torch_deploy_forward_zoo_fp(
            tm, coder, medians, np.transpose(img, (0, 3, 1, 2)).copy())
        compressed = rt.compress(jnp.asarray(img))
        assert compressed['strings'][0][0] == t_bits, 'bitstream mismatch'
        f_xhat = np.transpose(np.asarray(rt.decompress(**compressed)),
                              (0, 3, 1, 2))
        np.testing.assert_allclose(f_xhat, t_xhat, rtol=2e-3, atol=2e-3)


def _hyper_pipelines(torch_cls, mean_scale, seed):
    from sc2bench_tpu.ops.rans.coder import RansCoder
    tm = randomize_for_parity(torch_cls(n=N, m=M), seed=seed)
    z_cdf, z_len, z_off, z_med = tm.entropy_bottleneck.update()
    g_cdf, g_len, g_off, _st = tm.gaussian_conditional.update()
    z_coder = RansCoder(z_cdf, z_len, z_off)
    y_coder = RansCoder(g_cdf, g_len, g_off)
    rt = _runtime(ScaleHyperpriorCodec(n=N, m=M, mean_scale=mean_scale),
                  tm, ZOO_HYPERPRIOR_RULES, ZOO_HYPERPRIOR_DECONV_PATHS)
    golden = {'z': (z_cdf, z_len, z_off, z_med),
              'g': (g_cdf, g_len, g_off)}
    return tm, (z_coder, y_coder, golden), rt


@pytest.fixture(scope='module')
def shp_pipelines():
    return _hyper_pipelines(TorchZooScaleHyperprior, False, seed=22)


@pytest.fixture(scope='module')
def mshp_pipelines():
    return _hyper_pipelines(TorchZooMeanScaleHyperprior, True, seed=23)


def test_zoo_hyperprior_tables_bit_identical(shp_pipelines):
    _, (_, _, golden), rt = shp_pipelines
    z_cdf, z_len, z_off, z_med = golden['z']
    np.testing.assert_array_equal(rt.codec.tables.quantized_cdf, z_cdf)
    np.testing.assert_array_equal(rt.codec.tables.cdf_length, z_len)
    np.testing.assert_array_equal(rt.codec.tables.offset, z_off)
    np.testing.assert_allclose(rt.codec.tables.medians, z_med,
                               rtol=0, atol=1e-6)
    g_cdf, g_len, g_off = golden['g']
    np.testing.assert_array_equal(rt.codec.g_tables.quantized_cdf, g_cdf)
    np.testing.assert_array_equal(rt.codec.g_tables.cdf_length, g_len)
    np.testing.assert_array_equal(rt.codec.g_tables.offset, g_off)


@pytest.mark.parametrize('fixture_name', ['shp_pipelines',
                                          'mshp_pipelines'])
def test_zoo_hyperprior_bitstreams_and_recon_match(fixture_name, request):
    tm, (z_coder, y_coder, golden), rt = request.getfixturevalue(
        fixture_name)
    z_med = golden['z'][3]
    for img in _images():
        t_xhat, t_y_bits, t_z_bits = torch_deploy_forward_zoo_hyper(
            tm, z_coder, y_coder, z_med,
            np.transpose(img, (0, 3, 1, 2)).copy())
        compressed = rt.compress(jnp.asarray(img))
        assert compressed['strings'][0][0] == t_y_bits, 'y stream mismatch'
        assert compressed['strings'][1][0] == t_z_bits, 'z stream mismatch'
        f_xhat = np.transpose(np.asarray(rt.decompress(**compressed)),
                              (0, 3, 1, 2))
        np.testing.assert_allclose(f_xhat, t_xhat, rtol=2e-3, atol=2e-3)
