"""End-to-end smoke tests for the config families added to match the
reference grid 1:1: input-compression wrappers through the engines
(cls/det/seg), coco/voc end-to-end and ghnd-bq training, and stage-1
convergence for the RegNet and hybrid-ViT entropic students."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sc2bench_tpu.models  # noqa: F401
import sc2bench_tpu.transforms  # noqa: F401


def _synthetic_cls_loader(n=2, size=(32, 32), classes=5, bs=1):
    return {'dataset': {'key': 'SyntheticClassificationDataset',
                        'kwargs': {'num_samples': n, 'image_size': list(size),
                                   'num_classes': classes,
                                   'normalized': False}},
            'batch_size': bs}


def _synthetic_det_loader(n=2, size=(64, 64), classes=5, bs=1):
    return {'dataset': {'key': 'SyntheticDetectionDataset',
                        'kwargs': {'num_samples': n, 'image_size': list(size),
                                   'num_classes': classes}},
            'batch_size': bs}


def _synthetic_seg_loader(n=2, size=(64, 64), classes=5, bs=1):
    return {'dataset': {'key': 'SyntheticSegmentationDataset',
                        'kwargs': {'num_samples': n, 'image_size': list(size),
                                   'num_classes': classes}},
            'batch_size': bs}


@pytest.mark.slow
def test_classification_input_compression_wrapper_engine():
    """ilsvrc2012/input_compression family: codec wrapper through the
    ClassificationEngine test path (test-only, batch 1, byte accounting)."""
    from sc2bench_tpu.train.engine import ClassificationEngine
    config = {
        'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
        'models': {'wrapper': {
            'key': 'CodecInputCompressionClassifier',
            'classification_model': {'key': 'resnet50',
                                     'kwargs': {'num_classes': 5}},
            'kwargs': {
                'codec_encoder_decoder': {
                    'key': 'PILImageModule',
                    'kwargs': {'format': 'JPEG', 'quality': 50,
                               'returns_file_size': True}},
                'post_transform': [{'key': 'CustomToTensor', 'kwargs': {}}],
                'analysis_config': {'analyzer_configs': [
                    {'key': 'FileSizeAccumulator',
                     'kwargs': {'unit': 'KB'}}]}}}},
        'test': {'test_data_loader': _synthetic_cls_loader()},
    }
    engine = ClassificationEngine(config, image_size=(32, 32))
    with pytest.raises(ValueError):
        engine.train()
    result, summaries = engine.test()
    assert 'acc1' in result
    assert summaries and summaries[0]['num_samples'] == 2
    assert summaries[0]['mean'] > 0


@pytest.mark.slow
def test_detection_input_compression_wrapper_engine():
    """coco2017/input_compression family: compressing RCNN transform →
    detector → COCO eval through the DetectionEngine test path."""
    from sc2bench_tpu.train.det_engine import DetectionEngine
    config = {
        'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
        'min_size': 64,
        'models': {'wrapper': {
            'key': 'InputCompressionDetectionModel',
            'detection_model': {'key': 'faster_rcnn_model',
                                'kwargs': {'num_classes': 5},
                                'init_image_size': [64, 64]},
            'kwargs': {
                'codec_config': {'key': 'PILImageModule',
                                 'kwargs': {'format': 'JPEG',
                                            'quality': 50}},
                'transform_kwargs': {'min_size': 64, 'max_size': 64}}}},
        'test': {'test_data_loader': _synthetic_det_loader()},
    }
    engine = DetectionEngine(config, canvas_size=64)
    with pytest.raises(ValueError):
        engine.train()
    stats = engine.test()
    assert 'AP' in stats
    assert stats['data_size'][0]['num_samples'] == 2


@pytest.mark.slow
def test_segmentation_input_compression_wrapper_engine():
    """pascal_voc2012/input_compression family: codec round-trip →
    DeepLabv3 → mIoU through the SegmentationEngine test path."""
    from sc2bench_tpu.train.seg_engine import SegmentationEngine
    config = {
        'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
        'models': {'wrapper': {
            'key': 'CodecInputCompressionSegmentationModel',
            'segmentation_model': {'key': 'deeplabv3_model',
                                   'kwargs': {'backbone_name': 'resnet50',
                                              'num_classes': 5,
                                              'uses_aux': False}},
            'kwargs': {
                'codec_encoder_decoder': {
                    'key': 'PILImageModule',
                    'kwargs': {'format': 'JPEG', 'quality': 50,
                               'returns_file_size': True}},
                'analysis_config': {'analyzer_configs': [
                    {'key': 'FileSizeAccumulator',
                     'kwargs': {'unit': 'KB'}}]}}}},
        'test': {'test_data_loader': _synthetic_seg_loader()},
    }
    engine = SegmentationEngine(config, image_size=(64, 64), num_classes=5)
    result, summaries = engine.test()
    assert 'miou' in result
    assert summaries and summaries[0]['num_samples'] == 2


@pytest.mark.slow
def test_detection_end_to_end_family():
    """coco2017/end-to-end family: teacher-less detector training with
    detection losses + β·bpp rate term, then deploy test."""
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
            'train_data_loader': _synthetic_det_loader(),
            'val_data_loader': _synthetic_det_loader(),
            'num_epochs': 1, 'train_bn': False,
            'detection_loss_weight': 1.0,
            'optimizer': {'key': 'SGD',
                          'kwargs': {'lr': 0.001, 'momentum': 0.9}},
            'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                'sub_terms': {'bpp': {'criterion': {
                    'key': 'BppLoss', 'kwargs': {
                        'entropy_module_path':
                            'backbone.bottleneck_layer.eb_out',
                        'reduction': 'sum'}}, 'weight': 1e-7}}}}},
        'test': {'test_data_loader': _synthetic_det_loader()},
    }
    engine = DetectionEngine(config, canvas_size=64)
    engine.train()
    stats = engine.test()
    assert 'AP' in stats and 'data_size' in stats


@pytest.mark.slow
def test_detection_ghnd_bq_family():
    """coco2017/ghnd-bq family: teacher→student head distillation (hint MSE
    on backbone stages) with a CR+BQ bottleneck."""
    from sc2bench_tpu.train.det_engine import DetectionEngine
    config = {
        'dependencies': ['sc2bench_tpu.models'],
        'min_size': 64, 'max_boxes': 8,
        'models': {
            'teacher_model': {'key': 'faster_rcnn_model',
                              'kwargs': {'num_classes': 5}},
            'student_model': {
                'key': 'faster_rcnn_model',
                'kwargs': {'num_classes': 5,
                           'backbone_config': {
                               'resnet_name': 'resnet50',
                               'bottleneck_config': {
                                   'key': 'larger_resnet_bottleneck',
                                   'kwargs': {'bottleneck_channel': 2}}}}}},
        'train': {
            'train_data_loader': _synthetic_det_loader(),
            'val_data_loader': _synthetic_det_loader(),
            'stage1': {
                'num_epochs': 1, 'train_bn': False,
                'detection_loss_weight': 0.0,
                'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
                'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                    'sub_terms': {'hint1': {'criterion': {
                        'key': 'MSELoss', 'kwargs': {
                            'student_module_path':
                                'backbone.bottleneck_layer_out',
                            'teacher_module_path': 'backbone.layer1_out',
                            'reduction': 'sum'}}, 'weight': 1.0}}}}}},
        'test': {'test_data_loader': _synthetic_det_loader()},
    }
    engine = DetectionEngine(config, canvas_size=64)
    best = engine.train()
    assert np.isfinite(best)


@pytest.mark.slow
def test_segmentation_end_to_end_family():
    """pascal_voc2012/end-to-end family: teacher-less DeepLabv3 with
    CE + β·bpp, then deploy test with data-size accounting."""
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
            'train_data_loader': _synthetic_seg_loader(),
            'val_data_loader': _synthetic_seg_loader(),
            'num_epochs': 1, 'epoch_to_update': 1, 'train_bn': False,
            'optimizer': {'key': 'SGD',
                          'kwargs': {'lr': 0.01, 'momentum': 0.9}},
            'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                'sub_terms': {
                    'ce': {'criterion': {'key': 'SegCrossEntropyLoss',
                                         'kwargs': {'module_path': 'output'}},
                           'weight': 1.0},
                    'bpp': {'criterion': {'key': 'BppLoss', 'kwargs': {
                        'entropy_module_path':
                            'backbone.bottleneck_layer.eb_out',
                        'reduction': 'sum'}}, 'weight': 1e-7}}}}},
        'test': {'test_data_loader': _synthetic_seg_loader()},
    }
    engine = SegmentationEngine(config, image_size=(64, 64), num_classes=5)
    engine.train()
    result, summaries = engine.test()
    assert 'miou' in result and summaries[0]['mean'] > 0


@pytest.mark.slow
def test_segmentation_ghnd_bq_family():
    """pascal_voc2012/ghnd-bq family: hint distillation from a DeepLabv3
    teacher into a CR+BQ student backbone."""
    from sc2bench_tpu.train.seg_engine import SegmentationEngine
    config = {
        'dependencies': ['sc2bench_tpu.models'],
        'models': {
            'teacher_model': {'key': 'deeplabv3_model',
                              'kwargs': {'backbone_name': 'resnet50',
                                         'num_classes': 5,
                                         'uses_aux': False}},
            'student_model': {
                'key': 'deeplabv3_model',
                'kwargs': {'backbone_name': 'resnet50', 'num_classes': 5,
                           'uses_aux': False,
                           'bottleneck_config': {
                               'key': 'larger_resnet_bottleneck',
                               'kwargs': {'bottleneck_channel': 2}}}}},
        'train': {
            'train_data_loader': _synthetic_seg_loader(),
            'val_data_loader': _synthetic_seg_loader(),
            'stage1': {
                'num_epochs': 1, 'train_bn': False,
                'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
                'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                    'sub_terms': {'hint1': {'criterion': {
                        'key': 'MSELoss', 'kwargs': {
                            'student_module_path':
                                'backbone.bottleneck_layer_out',
                            'teacher_module_path': 'backbone.layer1_out',
                            'reduction': 'sum'}}, 'weight': 1.0}}}}}},
        'test': {'test_data_loader': _synthetic_seg_loader()},
    }
    engine = SegmentationEngine(config, image_size=(64, 64), num_classes=5)
    best = engine.train()
    assert np.isfinite(best)


def _es_stage1_smoke(student_module, teacher_module, hint_pairs,
                     image_size=(64, 64), steps=6):
    """Run a few stage-1 distillation steps; the hint+bpp loss must drop."""
    from sc2bench_tpu.train.box import DistillationBox
    x = jnp.zeros((2, *image_size, 3))
    t_vars = jax.jit(lambda r, x: teacher_module.init(r, x, train=False))(
        {'params': jax.random.key(0)}, x)
    t_vars = {'params': t_vars['params'],
              'batch_stats': t_vars.get('batch_stats', {})}
    s_vars = jax.jit(lambda r, x: student_module.init(r, x, mode='train'))(
        {'params': jax.random.key(1), 'noise': jax.random.key(2)}, x)
    s_vars = {'params': s_vars['params'],
              'batch_stats': s_vars.get('batch_stats', {})}
    sub_terms = {}
    for i, (sp, tp) in enumerate(hint_pairs):
        sub_terms[f'hint{i}'] = {'criterion': {'key': 'MSELoss', 'kwargs': {
            'student_module_path': sp, 'teacher_module_path': tp,
            'reduction': 'mean'}}, 'weight': 1.0}
    sub_terms['bpp'] = {'criterion': {'key': 'BppLoss', 'kwargs': {
        'entropy_module_path': 'bottleneck_layer.eb_out',
        'reduction': 'batchmean'}}, 'weight': 1e-4}
    stage = {'num_epochs': 1, 'train_bn': False,
             'optimizer': {'key': 'Adam', 'kwargs': {'lr': 1e-3}},
             'criterion': {'key': 'WeightedSumLoss',
                           'kwargs': {'sub_terms': sub_terms}}}
    box = DistillationBox(student_module, s_vars, stage,
                          teacher_module=teacher_module,
                          teacher_variables=t_vars, steps_per_epoch=steps)
    xb = jax.random.normal(jax.random.key(3), (2, *image_size, 3))
    losses = []
    for i in range(steps):
        metrics = box.train_step(xb, None, jax.random.key(10 + i))
        losses.append(float(sum(jax.tree.leaves(metrics['loss']))))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_regnet_entropic_student_stage1_converges():
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.regnet import RegNet, SplittableRegNet
    teacher = RegNet(stage_widths=(32, 48, 64, 80),
                     stage_depths=(1, 1, 1, 1), group_width=8,
                     num_classes=10)
    student = SplittableRegNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=32),
        stage_widths=(48, 64, 80), stage_depths=(1, 1, 1), group_width=8,
        num_classes=10)
    _es_stage1_smoke(student, teacher,
                     [('bottleneck_layer_out', 's1_out'),
                      ('s2_out', 's2_out'), ('s3_out', 's3_out'),
                      ('s4_out', 's4_out')])


@pytest.mark.slow
def test_hybrid_vit_entropic_student_stage1_converges():
    from sc2bench_tpu.models.hybrid_vit import HybridViT, SplittableHybridViT
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    teacher = HybridViT(embed_dim=64, depth=2, num_heads=2, num_classes=10)
    student = SplittableHybridViT(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=256),
        embed_dim=64, depth=2, num_heads=2, num_classes=10)
    # r5 key space: the teacher sows stage0..stage3 with ORIGINAL timm
    # indices, so the bottleneck (which replaces stem+stage0) pairs with
    # teacher stage0_out (reference hook patch_embed.backbone.stages.0)
    # and the retained stages pair 1:1.
    _es_stage1_smoke(student, teacher,
                     [('bottleneck_layer_out', 'stage0_out'),
                      ('stage1_out', 'stage1_out'),
                      ('stage2_out', 'stage2_out'),
                      ('stage3_out', 'stage3_out')])


def test_efficientnet_builders_resolve():
    from sc2bench_tpu.registry import lookup
    for key in ('tf_efficientnet_l2_ns', 'tf_efficientnet_l2_ns_475',
                'regnety_064', 'hybrid_vit_small_r26_s32_224'):
        assert lookup('model', key) is not None, key


@pytest.mark.slow
def test_efficientnet_forward():
    from sc2bench_tpu.models.efficientnet import EfficientNet
    # smallest coefficients that still exercise every block type
    # (MBConv+SE, stem/head); the L2-scale variants compile in the slow
    # tier via the zoo tests — keeps the fast tier under the 90s budget
    m = EfficientNet(width_coefficient=0.25, depth_coefficient=0.1,
                     num_classes=7)
    x = jnp.zeros((1, 32, 32, 3))
    v = jax.jit(lambda r, x: m.init(r, x))({'params': jax.random.key(0)}, x)
    out = jax.jit(lambda v, x: m.apply(v, x))(
        {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}, x)
    assert out.shape == (1, 7)


@pytest.mark.slow
def test_jahp_input_compression_wrapper_engine():
    """ilsvrc2012/input_compression mbt2018 family: the registry must
    route `joint_autoregressive_hierarchical_prior` to the
    autoregressive runtime (r5 fix — ImageCodecRuntime's factorized
    path KeyErrors on its encode_ops contract), and the wrapper must
    run the full compress→decompress→classify protocol with byte
    accounting."""
    from sc2bench_tpu.train.engine import ClassificationEngine
    config = {
        'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
        'models': {'wrapper': {
            'key': 'NeuralInputCompressionClassifier',
            'classification_model': {'key': 'resnet50',
                                     'kwargs': {'num_classes': 5}},
            'compression_model': {
                'key': 'joint_autoregressive_hierarchical_prior',
                'kwargs': {'quality': 1, 'n': 6, 'm': 6,
                           'image_size': [64, 64]}},
            'kwargs': {
                'analysis_config': {'analyzer_configs': [
                    {'key': 'FileSizeAnalyzer', 'kwargs': {'unit': 'KB'}}]},
            }}},
        'test': {'test_data_loader': _synthetic_cls_loader(
            size=(64, 64))},
    }
    engine = ClassificationEngine(config, image_size=(64, 64))
    from sc2bench_tpu.models.zoo_jahp import JointAutoregressiveRuntime
    assert isinstance(engine.wrapper.compression_model,
                      JointAutoregressiveRuntime)
    result, summaries = engine.test()
    assert 'acc1' in result
    assert summaries and summaries[0]['num_samples'] == 2
    assert summaries[0]['mean'] > 0
