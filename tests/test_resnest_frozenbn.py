"""ResNeSt split-attention tail and the FrozenBatchNorm option
(reference `backbone.py:786-820` and `:690-698`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sc2bench_tpu.models  # noqa: F401


def test_split_attention_conv_radix_weights_sum_to_one():
    from sc2bench_tpu.models.resnest import SplitAttentionConv
    m = SplitAttentionConv(channels=16, radix=2)
    x = jnp.ones((1, 8, 8, 8))
    v = jax.jit(m.init)({'params': jax.random.key(0)}, x)
    y = jax.jit(m.apply)({'params': v['params'],
                          'batch_stats': v.get('batch_stats', {})}, x)
    assert y.shape == (1, 8, 8, 16)


@pytest.mark.slow
def test_resnest_teacher_forward_and_sows():
    from sc2bench_tpu.models.resnest import ResNeSt
    m = ResNeSt(stage_sizes=(1, 1, 1, 1), num_classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: m.init(r, x))({'params': jax.random.key(0)}, x)
    out, state = m.apply(
        {'params': v['params'], 'batch_stats': v.get('batch_stats', {})},
        x, mutable=['intermediates'])
    assert out.shape == (1, 7)
    assert set(state['intermediates']) == {
        'layer1_out', 'layer2_out', 'layer3_out', 'layer4_out'}


@pytest.mark.slow
def test_splittable_resnest_is_split_attention():
    """The builder must produce a real radix tail (split-attention params in
    layer2), not a plain-ResNet alias, and run the tri-state forward."""
    from sc2bench_tpu.models.backbone import splittable_resnest
    from sc2bench_tpu.models.resnest import SplittableResNeSt
    m = splittable_resnest(
        {'key': 'FPBasedResNetBottleneck',
         'kwargs': {'num_bottleneck_channels': 8}},
        num_classes=10)
    assert isinstance(m, SplittableResNeSt)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: m.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    # radix attention lives in the fc1/fc2 of layer2's SplAt conv
    assert 'fc1' in v['params']['layer2']['block0']['conv2']
    out = m.apply({'params': v['params'],
                   'batch_stats': v.get('batch_stats', {})},
                  x, mode='finetune', train=False)
    assert out.shape == (1, 10)


@pytest.mark.slow
def test_frozen_batchnorm_stats_and_grads_frozen():
    from sc2bench_tpu.models.resnet import ResNetStage
    stage = ResNetStage(8, 1, strides=1, frozen_bn=True)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    v = stage.init({'params': jax.random.key(1)}, x)
    # no batch_stats updates even with train=True and mutable stats
    out, state = stage.apply(
        {'params': v['params'], 'batch_stats': v.get('batch_stats', {})},
        x, True, mutable=['batch_stats'])
    for leaf_before, leaf_after in zip(
            jax.tree.leaves(v.get('batch_stats', {})),
            jax.tree.leaves(state.get('batch_stats', {}))):
        np.testing.assert_array_equal(np.asarray(leaf_before),
                                      np.asarray(leaf_after))

    # BN scale/bias receive zero gradient; convs still get gradients
    def loss(params):
        y = stage.apply({'params': params,
                         'batch_stats': v.get('batch_stats', {})}, x, True,
                        mutable=['batch_stats'])[0]
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(v['params'])
    block = grads['block0']
    assert float(jnp.abs(block['bn1']['scale']).max()) == 0.0
    assert float(jnp.abs(block['bn1']['bias']).max()) == 0.0
    # convs still receive gradients (the residual path is zero-init via bn3
    # scale, so check the always-live downsample shortcut conv)
    assert float(jnp.abs(block['downsample_conv']['kernel']).max()) > 0.0


def test_frozen_bn_uses_running_stats_in_train_mode():
    """Frozen BN must normalize with the stored running stats even in train
    mode (torchvision FrozenBatchNorm2d semantics)."""
    from sc2bench_tpu.models.resnet import FrozenBatchNorm
    bn = FrozenBatchNorm()
    x = jax.random.normal(jax.random.key(0), (4, 4, 4, 3)) * 5 + 2
    v = bn.init({'params': jax.random.key(1)}, x)
    stats = {'mean': jnp.asarray([1.0, 2.0, 3.0]),
             'var': jnp.asarray([4.0, 9.0, 16.0])}
    y = bn.apply({'params': v['params'], 'batch_stats': stats}, x)
    expected = (np.asarray(x) - np.asarray(stats['mean'])) \
        / np.sqrt(np.asarray(stats['var']) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


def test_detection_backbone_frozen_bn_from_config():
    from sc2bench_tpu.models.detection.base import \
        SplittableDetectionBackbone
    bb = SplittableDetectionBackbone.from_config(
        {'resnet_name': 'resnet50', 'frozen_bn': True})
    assert bb.frozen_bn is True
