"""Shape/forward tests for the InceptionV3 / RegNet / hybrid-ViT splittable
families (reference `backbone.py:375-891`)."""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy compile-bound module (CPU mesh)


def _fp_bneck(target_ch):
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    return FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                   num_target_channels=target_ch)


def test_splittable_inception_v3_forward():
    from sc2bench_tpu.models.inception import SplittableInceptionV3
    model = SplittableInceptionV3(bottleneck_layer=_fp_bneck(192),
                                  num_classes=10)
    x = jnp.zeros((1, 75, 75, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    out = model.apply({'params': variables['params'],
                       'batch_stats': variables.get('batch_stats', {})},
                      x, mode='finetune')
    assert out.shape == (1, 10)


def test_splittable_regnet_forward():
    from sc2bench_tpu.models.regnet import SplittableRegNet
    model = SplittableRegNet(bottleneck_layer=_fp_bneck(144),
                             stage_widths=(72, 144, 288),
                             stage_depths=(1, 1, 1), group_width=24,
                             num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    out = model.apply({'params': variables['params'],
                       'batch_stats': variables.get('batch_stats', {})},
                      x, mode='finetune')
    assert out.shape == (1, 10)


def test_splittable_hybrid_vit_forward():
    from sc2bench_tpu.models.hybrid_vit import SplittableHybridViT
    model = SplittableHybridViT(bottleneck_layer=_fp_bneck(64),
                                embed_dim=64, depth=2, num_heads=2,
                                num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    out = model.apply({'params': variables['params'],
                       'batch_stats': variables.get('batch_stats', {})},
                      x, mode='finetune')
    assert out.shape == (1, 10)


def test_regnet_param_generator():
    from sc2bench_tpu.models.regnet import generate_regnet_params
    widths, depths = generate_regnet_params(112, 33.22, 2.27, 25, 72)
    assert sum(depths) == 25
    assert all(w % 8 == 0 or w % 72 == 0 for w in widths)
    assert len(widths) == len(depths) <= 5
