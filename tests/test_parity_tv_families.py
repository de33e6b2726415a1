"""Conversion parity for the DenseNet / InceptionV3 / EfficientNet-L2
families (VERDICT r4 item 3): randomized reference-key-space torch
replicas (`utils/torch_tv_ref.py`) -> `utils/torch_convert.py` rules ->
flax models; outputs must match to float tolerance. This pins the
pinned-weight path for every backbone family the reference names
(`/root/reference/sc2bench/models/backbone.py:279-485`,
`registry.py:108-139`, `hubconf.py:82-138`)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    EFFICIENTNET_RULES, SPLITTABLE_DENSENET_RULES,
    SPLITTABLE_INCEPTION_RULES, convert_state_dict, merge_into_variables)
from sc2bench_tpu.utils.torch_ref_model import randomize_for_parity  # noqa: E402


def _nchw(x_nhwc):
    return torch.from_numpy(
        np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))).float()


def _merged(fm, init_args, state_dict, rules):
    variables = fm.init(*init_args)
    converted = convert_state_dict(state_dict, rules)
    return merge_into_variables(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})}, converted)


def test_splittable_densenet_conversion_parity():
    """GHND DenseNet student: bottleneck (SimpleBottleneck spec list) +
    denseblock3/transition3/denseblock4/norm5 tail + classifier, full
    torch replica vs converted flax, bit-comparable logits."""
    from sc2bench_tpu.models.backbone import SplittableDenseNet
    from sc2bench_tpu.models.layer import larger_densenet_bottleneck
    from sc2bench_tpu.utils.torch_tv_ref import (TorchSimpleBottleneck,
                                                 TorchSplittableDenseNet)
    fb = larger_densenet_bottleneck(bottleneck_channel=6, bottleneck_idx=8)
    tb = TorchSimpleBottleneck(fb.encoder_specs, fb.decoder_specs)
    # tiny blocks, real layout: block_config[2:] drives the tail
    tm = randomize_for_parity(
        TorchSplittableDenseNet(tb, block_config=(1, 1, 2, 2), growth=8,
                                num_classes=11), seed=7)
    fm = SplittableDenseNet(bottleneck_layer=fb, block_config=(1, 1, 2, 2),
                            growth_rate=8, num_classes=11)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = _merged(
        fm, ({'params': jax.random.key(0)}, jnp.asarray(x)),
        tm.state_dict(), SPLITTABLE_DENSENET_RULES)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    want = tm(_nchw(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_splittable_inception_conversion_parity():
    """GHND InceptionV3 student: bottleneck + Mixed_5b..7c tail + fc.
    Torch keys live under `inception_modules.` (reference
    `backbone.py:375-484`); branch-name mapping dispatches on block type
    (branch3x3dbl_* differs between InceptionA and B)."""
    from sc2bench_tpu.models.inception import SplittableInceptionV3
    from sc2bench_tpu.models.layer import inception_v3_bottleneck
    from sc2bench_tpu.utils.torch_tv_ref import (
        TorchSimpleBottleneck, TorchSplittableInceptionV3)
    fb = inception_v3_bottleneck(bottleneck_channel=6, bottleneck_idx=7)
    tb = TorchSimpleBottleneck(fb.encoder_specs, fb.decoder_specs)
    tm = randomize_for_parity(TorchSplittableInceptionV3(tb, num_classes=5),
                              seed=11)
    fm = SplittableInceptionV3(bottleneck_layer=fb, num_classes=5)
    rng = np.random.default_rng(1)
    # 139x139 input -> 35x35x192 at Mixed_5b won't hold for the tiny
    # bottleneck; any input whose bottleneck output is 192ch works — the
    # inception tail channels are fixed constants in both frameworks
    x = rng.normal(0, 1, (1, 75, 75, 3)).astype(np.float32)
    variables = _merged(
        fm, ({'params': jax.random.key(0)}, jnp.asarray(x)),
        tm.state_dict(), SPLITTABLE_INCEPTION_RULES)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    want = tm(_nchw(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_tf_efficientnet_conversion_parity():
    """timm tf_efficientnet key space (stage-0 DepthwiseSeparableConv vs
    InvertedResidual naming, TF-SAME padding) -> flax EfficientNet. Run
    at B0 scale with an odd input size so the asymmetric SAME padding is
    actually exercised; the L2 coefficients only scale the same key
    space (`models/efficientnet.py` compound scaling)."""
    from sc2bench_tpu.models.efficientnet import EfficientNet
    from sc2bench_tpu.utils.torch_tv_ref import TorchTFEfficientNet
    tm = randomize_for_parity(
        TorchTFEfficientNet(1.0, 1.0, num_classes=9), seed=13)
    fm = EfficientNet(width_coefficient=1.0, depth_coefficient=1.0,
                      num_classes=9)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 65, 65, 3)).astype(np.float32)
    variables = _merged(
        fm, ({'params': jax.random.key(0)}, jnp.asarray(x)),
        tm.state_dict(), EFFICIENTNET_RULES)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    want = tm(_nchw(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_tf_efficientnet_l2_key_space_scales():
    """The L2 coefficients (4.3/5.3) produce the same key space on both
    sides: every converted torch key must land on a flax leaf with a
    matching shape (structure-only — no forward at L2 scale)."""
    from sc2bench_tpu.models.efficientnet import EfficientNet
    from sc2bench_tpu.utils.torch_tv_ref import TorchTFEfficientNet
    tm = TorchTFEfficientNet(4.3, 5.3, num_classes=3)
    fm = EfficientNet(width_coefficient=4.3, depth_coefficient=5.3,
                      num_classes=3)
    converted = convert_state_dict(tm.state_dict(), EFFICIENTNET_RULES)
    shapes = jax.eval_shape(
        lambda: fm.init(jax.random.key(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        train=False))
    # merge against the shape tree: merge_into_variables raises on any
    # missing scope or shape mismatch
    tree = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                        {'params': shapes['params'],
                         'batch_stats': shapes.get('batch_stats', {})})
    merge_into_variables(tree, converted)
