"""Tiny end-to-end tests for the detection and segmentation engines and
their deploy runtimes (synthetic data, small shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sc2bench_tpu.models  # noqa: F401  (registries)


def _seg_model():
    from sc2bench_tpu.models.segmentation.base import \
        SegmentationBackboneFeatures
    from sc2bench_tpu.models.segmentation.deeplabv3 import create_deeplabv3
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    backbone = SegmentationBackboneFeatures(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=256),
        stage_sizes=(1, 1, 1, 1), return_aux=False)
    model = create_deeplabv3(backbone, num_classes=5, uses_aux=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    return model, {'params': variables['params'],
                   'batch_stats': variables.get('batch_stats', {})}


@pytest.mark.slow
def test_split_segmentation_runtime_deploy():
    from sc2bench_tpu.models.segmentation.wrapper import \
        SplitSegmentationRuntime
    model, variables = _seg_model()
    rt = SplitSegmentationRuntime(model, variables)
    rt.update()
    rt.eval()
    rt.activate_analysis()
    x = jax.random.normal(jax.random.key(2), (1, 64, 64, 3))
    out = rt(x)
    assert out.shape == (1, 64, 64, 5)
    assert rt.summarize()[0]['mean'] > 0
    # deploy output matches the finetune (dequantize) forward
    ref = model.apply(variables, x, mode='finetune')['out']
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_segmentation_engine_end_to_end():
    from sc2bench_tpu.train.seg_engine import SegmentationEngine
    config = {
        'dependencies': ['sc2bench_tpu.models'],
        'models': {'model': {
            'key': 'deeplabv3_model',
            'kwargs': {'backbone_name': 'resnet50', 'num_classes': 5,
                       'uses_aux': False,
                       'bottleneck_config': {
                           'key': 'FPBasedResNetBottleneck',
                           'kwargs': {'num_bottleneck_channels': 8,
                                      'num_target_channels': 256}}}}},
        'train': {
            'train_data_loader': {'dataset': {
                'key': 'SyntheticSegmentationDataset',
                'kwargs': {'num_samples': 4, 'image_size': [64, 64],
                           'num_classes': 5}}, 'batch_size': 2},
            'val_data_loader': {'dataset': {
                'key': 'SyntheticSegmentationDataset',
                'kwargs': {'num_samples': 2, 'image_size': [64, 64],
                           'num_classes': 5}}, 'batch_size': 2},
            'stage1': {
                'num_epochs': 1, 'epoch_to_update': 1, 'train_bn': False,
                'optimizer': {'key': 'SGD',
                              'kwargs': {'lr': 0.01, 'momentum': 0.9}},
                'scheduler': {'key': 'poly', 'kwargs': {'power': 0.9}},
                'criterion': {'key': 'SegCrossEntropyLoss',
                              'kwargs': {'module_path': 'output'}}}},
        'test': {'test_data_loader': {'dataset': {
            'key': 'SyntheticSegmentationDataset',
            'kwargs': {'num_samples': 2, 'image_size': [64, 64],
                       'num_classes': 5}}, 'batch_size': 1}},
    }
    engine = SegmentationEngine(config, image_size=(64, 64), num_classes=5)
    engine.train()
    assert engine.runtime.bottleneck_updated
    result, summaries = engine.test()
    assert 'miou' in result
    assert summaries[0]['num_samples'] == 2


@pytest.mark.slow
def test_detection_engine_end_to_end():
    from sc2bench_tpu.train.det_engine import DetectionEngine
    config = {
        'dependencies': ['sc2bench_tpu.models'],
        'min_size': 64, 'max_boxes': 8,
        'models': {'model': {
            'key': 'faster_rcnn_model',
            'kwargs': {'num_classes': 5,
                       'backbone_config': {
                           'resnet_name': 'resnet50',
                           'bottleneck_config': {
                               'key': 'FPBasedResNetBottleneck',
                               'kwargs': {'num_bottleneck_channels': 8,
                                          'num_target_channels': 256}}}}}},
        'train': {
            'train_data_loader': {'dataset': {
                'key': 'SyntheticDetectionDataset',
                'kwargs': {'num_samples': 2, 'image_size': [64, 64],
                           'num_classes': 5}}, 'batch_size': 1},
            'val_data_loader': {'dataset': {
                'key': 'SyntheticDetectionDataset',
                'kwargs': {'num_samples': 2, 'image_size': [64, 64],
                           'num_classes': 5}}, 'batch_size': 1},
            'stage1': {
                'num_epochs': 1, 'train_bn': False,
                'detection_loss_weight': 1.0,
                'optimizer': {'key': 'SGD',
                              'kwargs': {'lr': 0.001, 'momentum': 0.9}},
                'criterion': {'key': 'WeightedSumLoss',
                              'kwargs': {'sub_terms': {}}}}},
        'test': {'test_data_loader': {'dataset': {
            'key': 'SyntheticDetectionDataset',
            'kwargs': {'num_samples': 2, 'image_size': [64, 64],
                       'num_classes': 5}}, 'batch_size': 1}},
    }
    engine = DetectionEngine(config, canvas_size=96)
    best = engine.train()
    stats = engine.test()
    assert 'AP' in stats and np.isfinite(stats['AP'])
