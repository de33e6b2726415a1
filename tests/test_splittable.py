"""End-to-end splittable-model tests: the tri-state forward contract
(SURVEY.md §3.5) and the deploy path through the real rANS bitstream."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc2bench_tpu.models.backbone import SplittableResNet, splittable_resnet
from sc2bench_tpu.models.layer import (
    FPBasedResNetBottleneck, MSHPBasedResNetBottleneck,
    SHPBasedResNetBottleneck, larger_resnet_bottleneck)
from sc2bench_tpu.models.runtime import SplitClassifierRuntime

IMG = (1, 64, 64, 3)  # small spatial size for test speed
NUM_CLASSES = 10


def _build(bneck, stage_sizes=(1, 1, 1, 1)):
    model = SplittableResNet(bottleneck_layer=bneck,
                             stage_sizes=stage_sizes,
                             num_classes=NUM_CLASSES)
    x = jnp.zeros(IMG)
    # jitted init: eager init dispatches op-by-op (~10x slower on CPU)
    variables = jax.jit(
        lambda rngs, x: model.init(rngs, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    return model, {'params': variables['params'],
                   'batch_stats': variables.get('batch_stats', {})}


_FP_CACHE = {}


def _build_fp():
    """Shared FP flagship-mini (module-level cache: tests only read the
    variables, so one init serves every FP test in this file)."""
    if 'fp' not in _FP_CACHE:
        _FP_CACHE['fp'] = _build(FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=256))
    return _FP_CACHE['fp']


@pytest.mark.slow
class TestFPSplittable:
    @pytest.fixture(scope='class')
    def rt(self):
        model, variables = _build_fp()
        return SplitClassifierRuntime(model, variables)

    def test_train_forward_and_entropy_capture(self, rt):
        x = jax.random.normal(jax.random.key(2), IMG)
        out, state = rt.module.apply(
            rt.variables, x, mode='train', rngs={'noise': jax.random.key(3)},
            mutable=['entropy', 'intermediates'])
        assert out.shape == (1, NUM_CLASSES)
        (y_hat, lik), = state['entropy']['bottleneck_layer']['eb_out']
        assert y_hat.shape[-1] == 8
        assert jnp.all(lik > 0)

    def test_finetune_forward(self, rt):
        x = jax.random.normal(jax.random.key(4), IMG)
        out = rt.module.apply(rt.variables, x, mode='finetune')
        assert out.shape == (1, NUM_CLASSES)

    def test_deploy_matches_finetune_quantization(self, rt):
        """After update(), the deploy path (true bitstream round-trip) must
        produce exactly the dequantize-mode logits — the bit-exactness
        contract of the rANS round trip."""
        rt.update()
        rt.eval()
        rt.activate_analysis()
        x = jax.random.normal(jax.random.key(5), IMG)
        logits_deploy = rt(x)
        logits_finetune = rt.module.apply(rt.variables, x, mode='finetune')
        np.testing.assert_allclose(np.asarray(logits_deploy),
                                   np.asarray(logits_finetune),
                                   rtol=2e-4, atol=2e-4)
        summary = rt.summarize()
        assert summary[0]['num_samples'] == 1
        assert summary[0]['mean'] > 0

    def test_compressed_size_reasonable(self, rt):
        rt.update()
        x = jax.random.normal(jax.random.key(6), IMG) * 0.1
        obj = rt.encode(x)
        total_bytes = sum(len(s) for s in obj['strings'][0])
        # 16x16x8 latent; near-zero input should code tightly
        assert total_bytes < 16 * 16 * 8


@pytest.mark.parametrize('cls', [SHPBasedResNetBottleneck,
                                 MSHPBasedResNetBottleneck])
@pytest.mark.slow
def test_hyperprior_deploy_roundtrip(cls):
    model, variables = _build(cls(num_latent_channels=4,
                                  num_bottleneck_channels=8,
                                  num_target_channels=256))
    rt = SplitClassifierRuntime(model, variables)
    x = jax.random.normal(jax.random.key(7), IMG)
    out_train = rt.module.apply(
        rt.variables, x, mode='train', rngs={'noise': jax.random.key(8)})
    assert out_train.shape == (1, NUM_CLASSES)
    rt.update()
    rt.eval()
    logits_deploy = rt(x)
    logits_finetune = rt.module.apply(rt.variables, x, mode='finetune')
    np.testing.assert_allclose(np.asarray(logits_deploy),
                               np.asarray(logits_finetune),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_crbq_bottleneck_shapes():
    """CR+BQ simple bottleneck: encoder output must reassemble to the tail's
    expected 256-channel layer1-substitute."""
    bneck = larger_resnet_bottleneck(bottleneck_channel=3)
    model, variables = _build(bneck)
    x = jax.random.normal(jax.random.key(9), IMG)
    out = model.apply(variables, x, mode='train',
                      rngs={'noise': jax.random.key(10)})
    assert out.shape == (1, NUM_CLASSES)


def test_builder_registry():
    m = splittable_resnet(
        {'key': 'FPBasedResNetBottleneck',
         'kwargs': {'num_bottleneck_channels': 8}},
        resnet_name='resnet50', num_classes=10)
    assert isinstance(m, SplittableResNet)


@pytest.mark.slow
def test_stream_deploy_matches_serial_and_bf16_tail():
    """The pipelined wire-format stream deploy produces bit-identical logits
    to the serial reference-API path (the cyclic int16 bitstream is lossless
    by construction), byte accounting matches, and the opt-in bf16 tail
    agrees on top-1."""
    model, variables = _build_fp()
    rt = SplitClassifierRuntime(model, variables)
    rt.update()
    rt.eval()
    imgs = [jax.random.normal(jax.random.key(i), IMG) for i in range(4)]

    serial = [np.asarray(rt(x)) for x in imgs]
    rt.activate_analysis()
    streamed = rt.stream_deploy(imgs, depth=2, workers=2)
    rt.deactivate_analysis()
    for s, p in zip(serial, streamed):
        np.testing.assert_array_equal(s, np.asarray(p))
    # per-sample byte accounting ran for every streamed image
    assert len(rt.analyzers[0].file_size_list) == len(imgs)

    # micro-batched decode (production serving mode): same per-image
    # logits; reuses the compiled encode/decode programs (fresh analysis)
    rt.clear_analysis()
    rt.activate_analysis()
    batched = rt.stream_deploy(imgs, depth=2, workers=2, decode_batch=3)
    rt.deactivate_analysis()
    assert len(batched) == len(imgs)
    for s, p in zip(serial, batched):
        np.testing.assert_allclose(s, np.asarray(p), rtol=2e-5, atol=2e-5)
    assert len(rt.analyzers[0].file_size_list) == len(imgs)

    rt_bf = SplitClassifierRuntime(model, variables, deploy_bf16_tail=True)
    rt_bf.update()
    rt_bf.eval()
    out_bf = rt_bf.stream_deploy(imgs, depth=2, workers=2)
    for s, b in zip(serial, out_bf):
        b = np.asarray(b)
        assert b.dtype == np.float32
        assert int(np.argmax(s)) == int(np.argmax(b))


@pytest.mark.slow
def test_bf16_tail_cache_invalidated_on_variables_swap():
    """Reassigning runtime.variables (checkpoint reload) must refresh the
    cached bf16 tail copy — a stale cast would mix two checkpoints."""
    model, v1 = _build_fp()
    # different init seed -> different params
    x = jnp.zeros(IMG)
    v2 = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(7), 'noise': jax.random.key(8)}, x)
    v2 = {'params': v2['params'],
          'batch_stats': v2.get('batch_stats', {})}
    img = jax.random.normal(jax.random.key(9), IMG)

    rt = SplitClassifierRuntime(model, v1, deploy_bf16_tail=True)
    rt.update()
    rt.eval()
    _ = rt(img)  # caches the bf16 copy of v1
    rt.variables = v2
    rt.update()
    out_swapped = np.asarray(rt(img))

    rt_fresh = SplitClassifierRuntime(model, v2, deploy_bf16_tail=True)
    rt_fresh.update()
    rt_fresh.eval()
    np.testing.assert_array_equal(out_swapped, np.asarray(rt_fresh(img)))


def test_decode_batch_rejected_for_hyperprior():
    # the guard fires before any program compiles or runs, so the module
    # never needs init/update — keeps the fast tier fast
    model = SplittableResNet(
        bottleneck_layer=SHPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=256,
            num_latent_channels=8),
        stage_sizes=(1, 1, 1, 1), num_classes=NUM_CLASSES)
    rt = SplitClassifierRuntime(model, {'params': {}})
    with pytest.raises(ValueError, match='decode_batch'):
        rt.stream_deploy([jnp.zeros(IMG)], decode_batch=4)


@pytest.mark.slow
def test_hyperprior_stream_deploy_matches_serial():
    """SHP stream deploy (int16 wire formats for z, y, and y-indexes)
    produces the same logits as the serial reference-API path — the wire
    bitstreams differ in layout but round-trip the same symbols."""
    model, variables = _build(SHPBasedResNetBottleneck(
        num_bottleneck_channels=8, num_target_channels=256,
        num_latent_channels=8))
    rt = SplitClassifierRuntime(model, variables)
    rt.update()
    rt.eval()
    imgs = [jax.random.normal(jax.random.key(20 + i), IMG) for i in range(3)]
    serial = [np.asarray(rt(x)) for x in imgs]
    rt.activate_analysis()
    streamed = rt.stream_deploy(imgs, depth=2, workers=2)
    for s, p in zip(serial, streamed):
        np.testing.assert_array_equal(s, np.asarray(p))
    assert len(rt.analyzers[0].file_size_list) == len(imgs)


def test_uint8_input_device_normalization():
    """With input_norm configured, uint8 images fed to the deploy paths are
    normalized on device and produce the same logits as host-normalized
    float inputs (4x less host->device traffic)."""
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    model, variables = _build_fp()
    rt = SplitClassifierRuntime(model, variables, input_norm=(mean, std))
    rt.update()
    rt.eval()
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, IMG, dtype=np.uint8)
    f32 = (raw.astype(np.float32) / 255.0 - mean) / std

    out_f32 = np.asarray(rt(jnp.asarray(f32)))
    out_u8 = np.asarray(rt(jnp.asarray(raw)))
    np.testing.assert_allclose(out_f32, out_u8, rtol=2e-4, atol=2e-4)

    streamed = rt.stream_deploy([jnp.asarray(raw)] * 2, depth=2, workers=2)
    np.testing.assert_allclose(out_u8, np.asarray(streamed[0]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fp_bottleneck_bf16_dtype_optin():
    """Opt-in bf16 conv dtype: encoder output is bf16 (MXU-rate training),
    but entropy math and deploy symbol rounding stay f32 — deploy symbols
    from the bf16 model agree with the f32 model within rounding."""
    mf32, v = _build_fp()
    mbf = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=256,
            dtype=jnp.bfloat16),
        stage_sizes=(1, 1, 1, 1), num_classes=NUM_CLASSES)
    x = jax.random.normal(jax.random.key(0), IMG)
    lat = mbf.apply(v, x, method=lambda m, x: m.bottleneck_layer.encoder(x))
    assert lat.dtype == jnp.bfloat16
    med = jnp.zeros((8,), jnp.float32)
    sym_bf = mbf.apply(v, x, med, method=lambda m, x, md:
                       m.bottleneck_layer.encode_ops(x, md))['symbols']
    sym_f32 = mf32.apply(v, x, med, method=lambda m, x, md:
                         m.bottleneck_layer.encode_ops(x, md))['symbols']
    assert sym_bf.dtype == jnp.int32
    # bf16 conv rounding can flip symbols sitting near .5 boundaries only
    frac_diff = float(jnp.mean((sym_bf != sym_f32).astype(jnp.float32)))
    assert frac_diff < 0.2, frac_diff
    out = mbf.apply(v, x, mode='train', train=False,
                    rngs={'noise': jax.random.key(1)})
    assert bool(jnp.all(jnp.isfinite(out)))
