"""Conversion parity for the timm-backed families (VERDICT r3 item 2).

Randomized timm-key-space torch replicas (`utils/torch_timm_ref.py`) ->
`utils/torch_convert.py` rules -> flax models; teacher logits and
splittable-tail outputs must match to float tolerance. This pins the
conversion path the reference's released checkpoints need
(`/root/reference/sc2bench/models/backbone.py:487-655,786-891`)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    RESNEST_RULES, SPLITTABLE_RESNEST_RULES, REGNET_RULES,
    SPLITTABLE_REGNET_RULES, HYBRID_VIT_RULES, SPLITTABLE_HYBRID_VIT_RULES,
    convert_state_dict, merge_into_variables)
from sc2bench_tpu.utils.torch_ref_model import randomize_for_parity  # noqa: E402


def _nchw(x_nhwc):
    return torch.from_numpy(
        np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))).float()


def test_resnest_teacher_conversion_parity():
    from sc2bench_tpu.models.resnest import ResNeSt
    from sc2bench_tpu.utils.torch_timm_ref import TorchResNeSt
    tm = randomize_for_parity(TorchResNeSt(stage_sizes=(1, 1, 1, 1),
                                           num_classes=13), seed=3)
    fm = ResNeSt(stage_sizes=(1, 1, 1, 1), num_classes=13)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x), train=False)
    converted = convert_state_dict(tm.state_dict(), RESNEST_RULES)
    variables = merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    want = tm(_nchw(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_splittable_resnest_tail_conversion_parity():
    """Feature -> layer2-4 -> fc through both frameworks (the reference's
    SplittableResNet tail over the timm resnest base)."""
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.resnest import SplittableResNeSt
    from sc2bench_tpu.utils.torch_timm_ref import TorchResNeSt
    tm = randomize_for_parity(TorchResNeSt(stage_sizes=(1, 1, 1, 1),
                                           num_classes=7), seed=5)
    fm = SplittableResNeSt(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=8),
        stage_sizes=(1, 1, 1, 1), num_classes=7)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    feat = rng.normal(0, 0.5, (1, 16, 16, 256)).astype(np.float32)
    variables = fm.init({'params': jax.random.key(0),
                         'noise': jax.random.key(1)},
                        jnp.asarray(x), mode='train')
    converted = convert_state_dict(tm.state_dict(),
                                   SPLITTABLE_RESNEST_RULES)
    variables = merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)
    got = np.asarray(fm.apply(variables, jnp.asarray(feat),
                              method=lambda m, f: m.forward_tail(f)))
    want = tm.forward_tail(_nchw(feat)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_hybrid_vit_teacher_conversion_parity():
    """Full `vit_small_r26_s32_224` teacher: ResNetV2-26 (StdConv 'SAME'
    + GroupNorm32) -> 1x1 patch proj -> ViT; reduced transformer depth
    for speed, backbone widths are the real ones."""
    from sc2bench_tpu.models.hybrid_vit import HybridViT
    from sc2bench_tpu.utils.torch_timm_ref import TorchHybridViT
    # 64x64 input -> total stride 32 -> 2x2 grid -> 5 tokens
    tm = randomize_for_parity(
        TorchHybridViT(depth=3, num_classes=13, num_tokens=5), seed=11)
    fm = HybridViT(depth=3, num_classes=13, sow_intermediates=False)
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x), train=False)
    converted = convert_state_dict(tm.state_dict(), HYBRID_VIT_RULES)
    variables = merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    want = tm(_nchw(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_splittable_hybrid_vit_tail_conversion_parity():
    """Student key space (`patch_embed_pruned_stages.{1..3}` — torch
    Sequential slicing keeps ORIGINAL indices, reference
    `backbone.py:565-655`): bottleneck-output feature -> stages 1-3 ->
    ViT through both frameworks."""
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.hybrid_vit import SplittableHybridViT
    from sc2bench_tpu.utils.torch_timm_ref import TorchHybridViT
    tm = randomize_for_parity(
        TorchHybridViT(depth=3, num_classes=7, num_tokens=5), seed=13)
    fm = SplittableHybridViT(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                                 num_target_channels=256),
        depth=3, num_classes=7, sow_intermediates=False)
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    feat = rng.normal(0, 0.5, (1, 16, 16, 256)).astype(np.float32)
    variables = fm.init({'params': jax.random.key(0),
                         'noise': jax.random.key(1)},
                        jnp.asarray(x), mode='train')
    converted = convert_state_dict(tm.splittable_state_dict(),
                                   SPLITTABLE_HYBRID_VIT_RULES)
    variables = merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)
    got = np.asarray(fm.apply(variables, jnp.asarray(feat),
                              method=lambda m, f: m.forward_tail(f)))
    want = tm.forward_tail(_nchw(feat)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_regnet_teacher_conversion_parity():
    from sc2bench_tpu.models.regnet import RegNet
    from sc2bench_tpu.utils.torch_timm_ref import TorchRegNetY
    widths, depths, gw = (32, 64, 144, 288), (1, 1, 2, 1), 16
    tm = randomize_for_parity(
        TorchRegNetY(widths, depths, gw, num_classes=11), seed=7)
    fm = RegNet(stage_widths=widths, stage_depths=depths, group_width=gw,
                num_classes=11)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x), train=False)
    converted = convert_state_dict(tm.state_dict(), REGNET_RULES)
    variables = merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    want = tm(_nchw(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_splittable_regnet_tail_conversion_parity():
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.regnet import SplittableRegNet
    from sc2bench_tpu.utils.torch_timm_ref import TorchRegNetY
    widths, depths, gw = (32, 64, 144, 288), (1, 1, 2, 1), 16
    tm = randomize_for_parity(
        TorchRegNetY(widths, depths, gw, num_classes=9), seed=9)
    fm = SplittableRegNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=32),
        stage_widths=widths[1:], stage_depths=depths[1:], group_width=gw,
        num_classes=9)
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    feat = rng.normal(0, 0.5, (1, 16, 16, 32)).astype(np.float32)
    variables = fm.init({'params': jax.random.key(0),
                         'noise': jax.random.key(1)},
                        jnp.asarray(x), mode='train')
    converted = convert_state_dict(tm.state_dict(),
                                   SPLITTABLE_REGNET_RULES)
    variables = merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)
    got = np.asarray(fm.apply(variables, jnp.asarray(feat),
                              method=lambda m, f: m.forward_tail(f)))
    want = tm.forward_tail(_nchw(feat)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
