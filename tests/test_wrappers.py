"""Wrapper-family tests: codec input compression, feature compression,
CR+BQ SplitClassifier quantizer path, EntropicClassifier split points."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

import sc2bench_tpu.models  # populate registries  # noqa: F401
import sc2bench_tpu.transforms  # noqa: F401

pytestmark = pytest.mark.slow  # heavy compile-bound module (CPU mesh)


def _small_resnet(num_classes=10):
    from sc2bench_tpu.models.resnet import ResNet
    model = ResNet(stage_sizes=(1, 1, 1, 1), num_classes=num_classes,
                   sow_intermediates=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {'params': jax.random.key(0)}, x)
    return model, {'params': variables['params'],
                   'batch_stats': variables.get('batch_stats', {})}


def test_codec_input_compression_classifier():
    from sc2bench_tpu.models.wrapper import CodecInputCompressionClassifier
    model, variables = _small_resnet()
    wrapper = CodecInputCompressionClassifier(
        model, variables,
        codec_encoder_decoder={'key': 'PILImageModule',
                               'kwargs': {'format': 'JPEG', 'quality': 50,
                                          'returns_file_size': True}},
        post_transform=[{'key': 'CustomToTensor', 'kwargs': {}},
                        {'key': 'Normalize', 'kwargs': {}}],
        analysis_config={'analyzer_configs': [
            {'key': 'FileSizeAccumulator', 'kwargs': {'unit': 'B'}}]})
    wrapper.activate_analysis()
    rng = np.random.default_rng(0)
    images = [Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                           dtype=np.uint8).astype(np.uint8))
              for _ in range(2)]
    logits = wrapper(images)
    assert logits.shape == (2, 10)
    summary = wrapper.summarize()[0]
    assert summary['num_samples'] == 2
    assert summary['mean'] > 100  # actual JPEG bytes recorded


def test_feature_compression_classifier():
    from sc2bench_tpu.models.wrapper import CodecFeatureCompressionClassifier
    model, variables = _small_resnet()
    wrapper = CodecFeatureCompressionClassifier(
        model, variables, split_layer='layer2',
        compression_transform={'key': 'PILTensorModule',
                               'kwargs': {'format': 'JPEG', 'quality': 90,
                                          'returns_file_size': True}},
        analysis_config={'analyzer_configs': [
            {'key': 'FileSizeAccumulator', 'kwargs': {'unit': 'B'}}]})
    wrapper.activate_analysis()
    x = np.random.default_rng(1).normal(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    logits = wrapper(x)
    assert logits.shape == (1, 10)
    assert wrapper.summarize()[0]['mean'] > 0


def test_split_classifier_int8_quantizer():
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import larger_resnet_bottleneck
    from sc2bench_tpu.models.wrapper import SplitClassifier
    bneck = larger_resnet_bottleneck(bottleneck_channel=3)
    model = SplittableResNet(bottleneck_layer=bneck,
                             stage_sizes=(1, 1, 1, 1), num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    wrapper = SplitClassifier(
        model, variables,
        compressor={'key': 'SimpleQuantizer', 'kwargs': {'num_bits': 8}},
        decompressor={'key': 'SimpleDequantizer', 'kwargs': {'num_bits': 8}})
    wrapper.eval()
    wrapper.activate_analysis()
    xr = jax.random.normal(jax.random.key(2), (1, 64, 64, 3))
    logits = wrapper(xr)
    assert logits.shape == (1, 10)
    # analysis recorded the quantized object's pickled size
    assert wrapper.summarize()[0]['mean'] > 0


def test_entropic_classifier_split_points():
    from sc2bench_tpu.models.entropic import EntropicClassifierModule
    from sc2bench_tpu.models.resnet import ResNet
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    base = ResNet(stage_sizes=(1, 1, 1, 1), num_classes=10,
                  sow_intermediates=False)
    for split in ['layer1', 'avgpool']:
        model = EntropicClassifierModule(base=base, split_layer=split)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
            {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
        variables = {'params': variables['params'],
                     'batch_stats': variables.get('batch_stats', {})}
        rt = SplitClassifierRuntime(model, variables)
        rt.update()
        rt.eval()
        xr = jax.random.normal(jax.random.key(3), (1, 64, 64, 3)) * 0.1
        logits_deploy = rt(xr)
        logits_ft = model.apply(variables, xr, mode='finetune')
        np.testing.assert_allclose(np.asarray(logits_deploy),
                                   np.asarray(logits_ft),
                                   rtol=2e-4, atol=2e-4)
