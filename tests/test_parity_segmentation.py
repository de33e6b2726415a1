"""Cross-framework segmentation parity: a torch DeepLabv3 replica in the
reference's exact key space (`/root/reference/sc2bench/models/segmentation/
base.py:42-65` + torchvision DeepLabHead/FCNHead) is weight-converted with
`SEGMENTATION_RULES` and must agree with the JAX model on the deploy
dequantize path: bottleneck round-trip -> dilated stride-8 stages -> ASPP
head -> bilinear upsample (align_corners=False semantics on both sides),
for both the main and aux logits.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.models.layer import FPBasedResNetBottleneck  # noqa: E402
from sc2bench_tpu.models.segmentation.base import (  # noqa: E402
    BaseSegmentationModel, SegmentationBackboneFeatures)
from sc2bench_tpu.models.segmentation.deeplabv3 import (  # noqa: E402
    DeepLabHead, FCNHead)
from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    SEGMENTATION_RULES, convert_state_dict, merge_into_variables)
from sc2bench_tpu.utils.torch_ref_model import (  # noqa: E402
    TorchSplittableDeepLabV3, randomize_for_parity,
    torch_segmentation_forward)

BCH, TARGET, STAGES, K, HW = 8, 256, (1, 1, 1, 1), 21, 64


@pytest.fixture(scope='module')
def seg_pipelines():
    tm = randomize_for_parity(
        TorchSplittableDeepLabV3(bch=BCH, target=TARGET,
                                 stage_sizes=STAGES, num_classes=K),
        seed=31)
    _, _, _, medians = \
        tm.backbone.bottleneck_layer.entropy_bottleneck.update()

    fm = BaseSegmentationModel(
        backbone=SegmentationBackboneFeatures(
            bottleneck_layer=FPBasedResNetBottleneck(
                num_bottleneck_channels=BCH, num_target_channels=TARGET),
            stage_sizes=STAGES, return_aux=True),
        classifier=DeepLabHead(num_classes=K),
        aux_classifier=FCNHead(num_classes=K))
    x0 = jnp.zeros((1, HW, HW, 3))
    variables = jax.jit(lambda r, x: fm.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(tm.state_dict(), SEGMENTATION_RULES)
    variables = merge_into_variables(variables, converted)
    return tm, medians, fm, variables


def test_segmentation_rules_cover_every_torch_key(seg_pipelines):
    import re
    tm, *_ = seg_pipelines
    skip_leaves = {'_quantized_cdf', '_offset', '_cdf_length',
                   'scale_table', 'num_batches_tracked', 'mask'}
    for key in tm.state_dict():
        path, _, leaf = key.rpartition('.')
        if leaf in skip_leaves:
            continue
        assert any(re.fullmatch(p, path) for p, r in SEGMENTATION_RULES
                   if r is not None), f'unmatched torch key: {key}'


def test_segmentation_logits_parity(seg_pipelines):
    """Converted weights: main and aux per-pixel logits match across
    frameworks through the full dilated-backbone + ASPP pipeline, and the
    per-pixel argmax prediction maps are identical."""
    tm, medians, fm, variables = seg_pipelines
    rng = np.random.default_rng(37)
    img = rng.normal(0, 1, (1, HW, HW, 3)).astype(np.float32)
    t_out, t_aux = torch_segmentation_forward(
        tm, medians, np.transpose(img, (0, 3, 1, 2)).copy())
    result = fm.apply(variables, jnp.asarray(img), mode='finetune',
                      train=False)
    f_out = np.asarray(result['out'])
    f_aux = np.asarray(result['aux'])
    np.testing.assert_allclose(f_out, np.transpose(t_out, (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(f_aux, np.transpose(t_aux, (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(f_out.argmax(-1),
                                  t_out.argmax(1))


def test_segmentation_deploy_bitstream_and_logits_match(seg_pipelines):
    """Full deploy parity through the wire: converted weights → encode →
    channel-major rANS bitstream (byte-identical to torch) → decode →
    dilated tail → DeepLab head → upsampled logits matching the torch
    replica, with identical per-pixel argmax (reference eval path
    `segmentation/base.py:66-82` + `backbone.py:130-144`)."""
    from sc2bench_tpu.models.segmentation.wrapper import (
        SplitSegmentationRuntime)
    from sc2bench_tpu.ops.rans.coder import RansCoder
    tm, medians, fm, variables = seg_pipelines
    cdf, cdf_len, off, _ = \
        tm.backbone.bottleneck_layer.entropy_bottleneck.update()
    coder = RansCoder(cdf, cdf_len, off)
    rt = SplitSegmentationRuntime(fm, variables)
    assert rt.update()
    rt.eval()
    np.testing.assert_array_equal(rt.codec.tables.quantized_cdf, cdf)

    rng = np.random.default_rng(41)
    img = rng.normal(0, 1, (1, HW, HW, 3)).astype(np.float32)
    nchw = np.transpose(img, (0, 3, 1, 2)).copy()
    t_out, _ = torch_segmentation_forward(tm, medians, nchw)

    # torch-side channel-major bitstream of the bottleneck symbols
    med = torch.from_numpy(np.asarray(medians, np.float32)).view(
        1, -1, 1, 1)
    y = tm.backbone.bottleneck_layer.encoder(torch.from_numpy(nchw))
    sym = torch.round(y - med).to(torch.int32).numpy()[0]
    c, h, w = sym.shape
    indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
    t_bits = coder.encode_with_indexes(sym.reshape(c, -1).ravel(), indexes)

    enc = fm.apply(variables, jnp.asarray(img), jnp.asarray(medians),
                   method=lambda m, x, m_: m.encode_ops(x, m_))
    strings = rt.codec.compress_symbols(np.asarray(enc['symbols']))
    assert strings[0] == t_bits, 'feature bitstream mismatch'

    # deploy-wire logits: encode → wire coder round-trip → decode tail
    f_out = np.asarray(rt(img))
    np.testing.assert_allclose(f_out, np.transpose(t_out, (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(f_out.argmax(-1), t_out.argmax(1))
