"""Full-model cross-framework parity: torch reference pipeline vs the JAX
deploy runtime, through encoder → entropy tables → rANS bitstream →
decoder → tail → logits.

This is the in-repo analogue of the reference's `-test_only`
checkpoint-reproduction protocol (`/root/reference/README.md:61-63,99-103`):
a complete torch SplittableResNet (reference key space) is built, its
weights are converted with `utils/torch_convert.py`, and the two stacks
must agree on (a) quantized coding tables bit-for-bit, (b) per-image
bitstream BYTES exactly, (c) byte accounting, and (d) logits to float
tolerance. Any numeric drift in either framework's deploy path fails here.
"""
import pickle

import numpy as np
import pytest

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.slow  # full-pipeline compiles (torch + 2 jit programs)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.models.backbone import SplittableResNet  # noqa: E402
from sc2bench_tpu.models.layer import FPBasedResNetBottleneck  # noqa: E402
from sc2bench_tpu.models.runtime import SplitClassifierRuntime  # noqa: E402
from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    SPLITTABLE_RESNET_RULES, convert_state_dict, merge_into_variables)
from sc2bench_tpu.utils.torch_ref_model import (  # noqa: E402
    TorchSplittableResNet, randomize_for_parity, torch_deploy_forward)

BCH, TARGET, STAGES, CLASSES, HW = 8, 64, (1, 1, 1, 1), 10, 64


@pytest.fixture(scope='module')
def pipelines():
    """(torch model, golden coder+tables, flax runtime w/ converted
    weights) — built once; the conversions are the object under test."""
    from sc2bench_tpu.ops.rans.coder import RansCoder
    tm = randomize_for_parity(
        TorchSplittableResNet(bch=BCH, target=TARGET, stage_sizes=STAGES,
                              num_classes=CLASSES), seed=3)
    cdf, cdf_len, offset, medians = \
        tm.bottleneck_layer.entropy_bottleneck.update()
    coder = RansCoder(cdf, cdf_len, offset)

    fm = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=BCH, num_target_channels=TARGET),
        stage_sizes=STAGES, num_classes=CLASSES)
    x0 = jnp.zeros((1, HW, HW, 3))
    variables = jax.jit(lambda r, x: fm.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(tm.state_dict(), SPLITTABLE_RESNET_RULES)
    variables = merge_into_variables(variables, converted)
    rt = SplitClassifierRuntime(fm, variables)
    assert rt.update()
    return tm, (coder, cdf, cdf_len, offset, medians), rt


def _images(n=4):
    rng = np.random.default_rng(11)
    return [rng.normal(0, 1, (1, HW, HW, 3)).astype(np.float32)
            for _ in range(n)]


def test_coding_tables_bit_identical(pipelines):
    """The product runtime's update() must rebuild the torch oracle's
    quantized CDF tables bit-for-bit from the CONVERTED weights."""
    _, (_, cdf, cdf_len, offset, medians), rt = pipelines
    np.testing.assert_array_equal(rt.codec.tables.quantized_cdf, cdf)
    np.testing.assert_array_equal(rt.codec.tables.cdf_length, cdf_len)
    np.testing.assert_array_equal(rt.codec.tables.offset, offset)
    np.testing.assert_allclose(rt.codec.tables.medians, medians,
                               rtol=0, atol=1e-6)


def test_bitstream_bytes_and_logits_match(pipelines):
    """Per-image: identical bitstream bytes, identical byte count, logits
    within float tolerance, identical prediction."""
    tm, (coder, *_, medians), rt = pipelines
    rt.eval()
    for img in _images():
        t_logits, t_bits = torch_deploy_forward(
            tm, coder, medians, np.transpose(img, (0, 3, 1, 2)).copy())
        compressed = rt.encode(jnp.asarray(img))
        f_bits = compressed['strings'][0][0]
        assert f_bits == t_bits, (
            f'bitstream mismatch: {len(f_bits)} vs {len(t_bits)} bytes')
        f_logits = np.asarray(rt.decode(**compressed))
        np.testing.assert_allclose(f_logits, t_logits, rtol=2e-3, atol=2e-3)
        assert int(np.argmax(f_logits)) == int(np.argmax(t_logits))


def test_stream_deploy_matches_torch(pipelines):
    """The pipelined serving path (stream_deploy, wire formats) must agree
    with the serial torch pipeline too — wire-format optimizations may not
    change a single logit beyond rounding."""
    tm, (coder, *_, medians), rt = pipelines
    rt.eval()
    images = _images(6)
    results = rt.stream_deploy([jnp.asarray(i) for i in images])
    for img, f_logits in zip(images, results):
        t_logits, t_bits = torch_deploy_forward(
            tm, coder, medians, np.transpose(img, (0, 3, 1, 2)).copy())
        np.testing.assert_allclose(np.asarray(f_logits), t_logits,
                                   rtol=2e-3, atol=2e-3)


def test_byte_accounting_matches(pipelines):
    """The analyzer's recorded data size must equal the size computed from
    the TORCH pipeline's bytes under the same pickle-size convention
    (reference `analysis.py:126-142` semantics) — i.e. both frameworks
    would report the same 'Bottleneck size [KB]' line."""
    import sys
    tm, (coder, *_, medians), rt = pipelines
    rt.eval()
    rt.clear_analysis()
    rt.activate_analysis()
    images = _images(3)
    expected = []
    for img in images:
        compressed = rt.encode(jnp.asarray(img))
        rt.analyze(compressed)
        _, t_bits = torch_deploy_forward(
            tm, coder, medians, np.transpose(img, (0, 3, 1, 2)).copy())
        t_obj = {'strings': [[t_bits]],
                 'shape': compressed['shape']}
        expected.append(sys.getsizeof(pickle.dumps(t_obj)) / 1024)
    summary = rt.summarize()[0]
    assert summary['num_samples'] == len(images)
    assert summary['mean'] == pytest.approx(float(np.mean(expected)),
                                            rel=1e-9)
    rt.deactivate_analysis()


# ---------------------------------------------------------------------------
# SHP (scale hyperprior) family: second full-model cross-framework pipeline
# ---------------------------------------------------------------------------

LCH = 4


@pytest.fixture(scope='module')
def shp_pipelines():
    """(torch SHP model, golden coders + z medians, flax runtime with
    converted weights) — the reference's SHP deploy path
    (`/root/reference/sc2bench/models/layer.py:633-676`) end to end."""
    from sc2bench_tpu.models.layer import SHPBasedResNetBottleneck
    from sc2bench_tpu.ops.rans.coder import RansCoder
    from sc2bench_tpu.utils.torch_convert import (SHP_DECONV_PATHS,
                                                  SPLITTABLE_SHP_RESNET_RULES)
    from sc2bench_tpu.utils.torch_ref_model import TorchSplittableSHPResNet
    tm = randomize_for_parity(
        TorchSplittableSHPResNet(bch=BCH, target=TARGET, lch=LCH,
                                 stage_sizes=STAGES, num_classes=CLASSES),
        seed=5)
    z_cdf, z_len, z_off, z_med = \
        tm.bottleneck_layer.entropy_bottleneck.update()
    g_cdf, g_len, g_off, _st = \
        tm.bottleneck_layer.gaussian_conditional.update()
    z_coder = RansCoder(z_cdf, z_len, z_off)
    y_coder = RansCoder(g_cdf, g_len, g_off)
    golden = {'z': (z_cdf, z_len, z_off, z_med),
              'g': (g_cdf, g_len, g_off)}

    fm = SplittableResNet(
        bottleneck_layer=SHPBasedResNetBottleneck(
            num_bottleneck_channels=BCH, num_target_channels=TARGET,
            num_latent_channels=LCH),
        stage_sizes=STAGES, num_classes=CLASSES)
    x0 = jnp.zeros((1, HW, HW, 3))
    variables = jax.jit(lambda r, x: fm.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(tm.state_dict(),
                                   SPLITTABLE_SHP_RESNET_RULES,
                                   deconv_paths=SHP_DECONV_PATHS)
    variables = merge_into_variables(variables, converted)
    rt = SplitClassifierRuntime(fm, variables)
    assert rt.update()
    return tm, (z_coder, y_coder, golden), rt


def test_shp_tables_bit_identical(shp_pipelines):
    """Both the factorized (z) and gaussian (y) coding tables rebuilt by
    the runtime's update() from CONVERTED weights must equal the torch
    oracle's bit-for-bit."""
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


def test_shp_bitstreams_and_logits_match(shp_pipelines):
    """Per-image: byte-identical y AND z bitstreams, logits within float
    tolerance, identical prediction — through g_a → h_a → z roundtrip →
    h_s → gaussian indexes → y roundtrip → g_s → tail in both stacks."""
    from sc2bench_tpu.utils.torch_ref_model import torch_deploy_forward_shp
    tm, (z_coder, y_coder, golden), rt = shp_pipelines
    rt.eval()
    z_med = golden['z'][3]
    for img in _images(3):
        t_logits, t_y_bits, t_z_bits = torch_deploy_forward_shp(
            tm, z_coder, y_coder, tm.bottleneck_layer.gaussian_conditional,
            z_med, np.transpose(img, (0, 3, 1, 2)).copy())
        compressed = rt.encode(jnp.asarray(img))
        assert compressed['strings'][0][0] == t_y_bits, 'y stream mismatch'
        assert compressed['strings'][1][0] == t_z_bits, 'z stream mismatch'
        f_logits = np.asarray(rt.decode(**compressed))
        np.testing.assert_allclose(f_logits, t_logits, rtol=2e-3, atol=2e-3)
        assert int(np.argmax(f_logits)) == int(np.argmax(t_logits))


@pytest.fixture(scope='module')
def mshp_pipelines():
    """Third family: mean-scale hyperprior (h_a over y, h_s -> scales+
    means chunked along channels; y symbols = round(y - means))."""
    from sc2bench_tpu.models.layer import MSHPBasedResNetBottleneck
    from sc2bench_tpu.ops.rans.coder import RansCoder
    from sc2bench_tpu.utils.torch_convert import (SHP_DECONV_PATHS,
                                                  SPLITTABLE_SHP_RESNET_RULES)
    from sc2bench_tpu.utils.torch_ref_model import TorchSplittableMSHPResNet
    tm = randomize_for_parity(
        TorchSplittableMSHPResNet(bch=BCH, target=TARGET, lch=LCH,
                                  stage_sizes=STAGES, num_classes=CLASSES),
        seed=7)
    z_cdf, z_len, z_off, z_med = \
        tm.bottleneck_layer.entropy_bottleneck.update()
    g_cdf, g_len, g_off, _st = \
        tm.bottleneck_layer.gaussian_conditional.update()
    z_coder = RansCoder(z_cdf, z_len, z_off)
    y_coder = RansCoder(g_cdf, g_len, g_off)

    fm = SplittableResNet(
        bottleneck_layer=MSHPBasedResNetBottleneck(
            num_bottleneck_channels=BCH, num_target_channels=TARGET,
            num_latent_channels=LCH),
        stage_sizes=STAGES, num_classes=CLASSES)
    x0 = jnp.zeros((1, HW, HW, 3))
    variables = jax.jit(lambda r, x: fm.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(tm.state_dict(),
                                   SPLITTABLE_SHP_RESNET_RULES,
                                   deconv_paths=SHP_DECONV_PATHS)
    variables = merge_into_variables(variables, converted)
    rt = SplitClassifierRuntime(fm, variables)
    assert rt.update()
    return tm, (z_coder, y_coder, z_med), rt


def test_mshp_bitstreams_and_logits_match(mshp_pipelines):
    """MSHP per-image parity: byte-identical y AND z streams and matching
    logits — the mean path (chunked h_s output, round(y - means),
    + means on decode) must agree across frameworks."""
    from sc2bench_tpu.utils.torch_ref_model import torch_deploy_forward_shp
    tm, (z_coder, y_coder, z_med), rt = mshp_pipelines
    rt.eval()
    for img in _images(3):
        t_logits, t_y_bits, t_z_bits = torch_deploy_forward_shp(
            tm, z_coder, y_coder, tm.bottleneck_layer.gaussian_conditional,
            z_med, np.transpose(img, (0, 3, 1, 2)).copy(),
            mean_scale=True)
        compressed = rt.encode(jnp.asarray(img))
        assert compressed['strings'][0][0] == t_y_bits, 'y stream mismatch'
        assert compressed['strings'][1][0] == t_z_bits, 'z stream mismatch'
        f_logits = np.asarray(rt.decode(**compressed))
        np.testing.assert_allclose(f_logits, t_logits, rtol=2e-3, atol=2e-3)
        assert int(np.argmax(f_logits)) == int(np.argmax(t_logits))


# ---------------------------------------------------------------------------
# JAHP (joint autoregressive + hierarchical prior, mbt2018): 4th family.
# The torch oracle codes SERIALLY per pixel in raster order (CompressAI
# `_compress_ar` semantics); the JAX runtime codes WAVEFRONT-PARALLEL.
# Parity here proves the wavefront schedule computes the exact same
# symbols/indexes as the serial scan, cross-framework, and that the
# z stream is byte-identical.
# ---------------------------------------------------------------------------

JN, JM, JHW = 8, 12, 64


@pytest.fixture(scope='module')
def jahp_pipelines():
    from sc2bench_tpu.models.zoo_jahp import (JointAutoregressiveCodec,
                                              JointAutoregressiveRuntime)
    from sc2bench_tpu.ops.rans.coder import RansCoder
    from sc2bench_tpu.utils.torch_convert import (JAHP_DECONV_PATHS,
                                                  JAHP_RULES)
    from sc2bench_tpu.utils.torch_ref_model import (
        TorchJointAutoregressiveCodec)
    tm = randomize_for_parity(TorchJointAutoregressiveCodec(n=JN, m=JM),
                              seed=13)
    z_cdf, z_len, z_off, z_med = tm.entropy_bottleneck.update()
    g_cdf, g_len, g_off, _st = tm.gaussian_conditional.update()
    z_coder = RansCoder(z_cdf, z_len, z_off)
    y_coder = RansCoder(g_cdf, g_len, g_off)
    golden = {'z': (z_cdf, z_len, z_off, z_med),
              'g': (g_cdf, g_len, g_off)}

    fm = JointAutoregressiveCodec(n=JN, m=JM)
    x0 = jnp.zeros((1, JHW, JHW, 3))
    variables = jax.jit(lambda r, x: fm.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params']}
    converted = convert_state_dict(tm.state_dict(), JAHP_RULES,
                                   deconv_paths=JAHP_DECONV_PATHS)
    variables = merge_into_variables(variables, converted)
    rt = JointAutoregressiveRuntime(fm, variables)
    assert rt.update()
    return tm, (z_coder, y_coder, golden), rt


def _jahp_images(n=2):
    rng = np.random.default_rng(17)
    return [rng.uniform(0, 1, (1, JHW, JHW, 3)).astype(np.float32)
            for _ in range(n)]


def test_jahp_tables_bit_identical(jahp_pipelines):
    _, (_, _, golden), rt = jahp_pipelines
    z_cdf, z_len, z_off, z_med = golden['z']
    np.testing.assert_array_equal(rt.codec.tables.quantized_cdf, z_cdf)
    np.testing.assert_array_equal(rt.codec.tables.cdf_length, z_len)
    np.testing.assert_array_equal(rt.codec.tables.offset, z_off)
    np.testing.assert_allclose(rt.codec.tables.medians, z_med,
                               rtol=0, atol=1e-6)
    g_cdf, g_len, g_off = golden['g']
    np.testing.assert_array_equal(rt.g_tables.quantized_cdf, g_cdf)
    np.testing.assert_array_equal(rt.g_tables.cdf_length, g_len)
    np.testing.assert_array_equal(rt.g_tables.offset, g_off)


def test_jahp_wavefront_matches_serial_raster(jahp_pipelines):
    """Per image: the JAX wavefront-parallel coder must produce the same
    symbols, gaussian indexes, byte-identical y AND z streams, and a
    matching reconstruction as the torch SERIAL raster-scan oracle — the
    cross-framework proof that the anti-diagonal schedule preserves
    mbt2018's autoregressive semantics exactly."""
    from sc2bench_tpu.utils.torch_ref_model import torch_deploy_forward_jahp
    tm, (z_coder, y_coder, golden), rt = jahp_pipelines
    z_med = golden['z'][3]
    for img in _jahp_images():
        x_hat_t, sym_grid, idx_grid, y_hat_t, z_bits = \
            torch_deploy_forward_jahp(
                tm, z_coder, z_med, np.transpose(img, (0, 3, 1, 2)).copy())
        compressed = rt.compress(jnp.asarray(img))
        assert compressed['strings'][1][0] == z_bits, 'z stream mismatch'
        # re-serialize the torch raster grids in the runtime's wavefront
        # order: byte-identical y streams <=> identical symbols+indexes
        h, w, _ = sym_grid.shape
        fronts = rt._wavefronts(h, w)
        sym_seq = np.concatenate(
            [sym_grid[ii, jj].ravel() for ii, jj in fronts])
        idx_seq = np.concatenate(
            [idx_grid[ii, jj].ravel() for ii, jj in fronts]).astype(
            np.int32)
        t_y_bits = y_coder.encode_with_indexes(sym_seq, idx_seq)
        assert compressed['strings'][0][0] == t_y_bits, 'y stream mismatch'
        # quantized latents agree across frameworks and schedules
        np.testing.assert_allclose(rt._last_y_hat, y_hat_t,
                                   rtol=1e-4, atol=1e-4)
        x_hat = np.asarray(rt.decompress(compressed['strings'],
                                         compressed['shape']))
        np.testing.assert_allclose(rt._last_y_hat_dec, rt._last_y_hat,
                                   rtol=0, atol=0)
        np.testing.assert_allclose(
            x_hat[0], np.transpose(x_hat_t[0], (1, 2, 0)),
            rtol=2e-3, atol=2e-3)
