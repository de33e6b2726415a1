"""Segmentation stack tests: DeepLabv3 forward shapes (dilated backbone),
splittable bottleneck variant, and the SegEvaluator confusion matrix."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sc2bench_tpu.utils.seg_eval import SegEvaluator


def test_seg_evaluator():
    ev = SegEvaluator(num_classes=3)
    target = np.asarray([0, 0, 1, 1, 2, 255])  # 255 ignored
    pred = np.asarray([0, 1, 1, 1, 0, 2])
    ev.update(target, pred)
    acc_global, acc, iou = ev.compute()
    assert abs(acc_global - 3 / 5) < 1e-9
    # class 1: tp=2 fn=0 fp=1 -> IoU 2/3
    assert abs(iou[1] - 2 / 3) < 1e-9
    assert 'mean IoU' in str(ev)


@pytest.mark.slow
def test_deeplabv3_shapes():
    from sc2bench_tpu.models.segmentation.deeplabv3 import deeplabv3_model
    model = deeplabv3_model(
        bottleneck_config={'key': 'FPBasedResNetBottleneck',
                           'kwargs': {'num_bottleneck_channels': 8,
                                      'num_target_channels': 256}},
        backbone_name='resnet50', num_classes=4, uses_aux=True)
    # tiny stage sizes for speed: rebuild with small backbone
    from sc2bench_tpu.models.segmentation.base import \
        SegmentationBackboneFeatures
    from sc2bench_tpu.models.segmentation.deeplabv3 import create_deeplabv3
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    backbone = SegmentationBackboneFeatures(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=256),
        stage_sizes=(1, 1, 1, 1), return_aux=True)
    model = create_deeplabv3(backbone, num_classes=4, uses_aux=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)},
        x, mode='train')
    out = model.apply(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})},
        x, mode='finetune', train=False)
    assert out['out'].shape == (1, 64, 64, 4)
    assert out['aux'].shape == (1, 64, 64, 4)


def test_dilated_backbone_output_stride():
    """DeepLab backbone must be stride 8 at 'out' (dilated layer3/4)."""
    from sc2bench_tpu.models.segmentation.base import \
        SegmentationBackboneFeatures
    backbone = SegmentationBackboneFeatures(
        bottleneck_layer=None, stage_sizes=(1, 1, 1, 1), return_aux=True)
    x = jnp.zeros((1, 64, 64, 3))
    # shapes only — eval_shape traces without compiling (fast tier)
    variables = jax.eval_shape(
        lambda: backbone.init({'params': jax.random.key(0)}, x))
    feats = jax.eval_shape(
        lambda v: backbone.apply(
            {'params': v['params'],
             'batch_stats': v.get('batch_stats', {})}, x), variables)
    assert feats['out'].shape[1:3] == (8, 8)   # 64/8
    assert feats['aux'].shape[1:3] == (8, 8)
    assert feats['out'].shape[-1] == 2048


@pytest.mark.slow
def test_bf16_deeplab_agrees_with_f32():
    """dtype='bfloat16' DeepLabv3 (stages + ASPP + heads in bf16, logits
    f32): same variables as the f32 model, per-pixel predictions agree
    on the overwhelming majority of pixels."""
    import sc2bench_tpu.models  # noqa: F401 (registry population)
    from sc2bench_tpu.registry import get as registry_get
    kwargs = dict(backbone_name='resnet50', num_classes=5, uses_aux=False,
                  bottleneck_config={
                      'key': 'FPBasedResNetBottleneck',
                      'kwargs': {'num_bottleneck_channels': 8,
                                 'num_target_channels': 256}})
    m32 = registry_get('model', 'deeplabv3_model')(**kwargs)
    mbf = registry_get('model', 'deeplabv3_model')(dtype='bfloat16',
                                                   **kwargs)
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3)) * 0.25
    v = jax.jit(lambda r, x: m32.init(r, x, mode='train'))(
        {'params': jax.random.key(1), 'noise': jax.random.key(2)}, x)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    o32 = jax.jit(lambda v, x: m32.apply(v, x, mode='finetune',
                                         train=False))(v, x)
    obf = jax.jit(lambda v, x: mbf.apply(v, x, mode='finetune',
                                         train=False))(v, x)
    assert np.asarray(obf['out']).dtype == np.float32
    p32 = np.asarray(jnp.argmax(o32['out'], -1))
    pbf = np.asarray(jnp.argmax(obf['out'], -1))
    agree = float((p32 == pbf).mean())
    assert agree > 0.95, agree
