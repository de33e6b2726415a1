"""Cross-framework detection parity: a torch Faster R-CNN + FPN replica in
the reference's exact key space (torchvision>=0.15.1 composition,
`/root/reference/sc2bench/models/detection/rcnn.py:113-166`) is
weight-converted with `DETECTION_RULES` and must agree with the JAX
`FasterRCNN` stage by stage on the deploy dequantize path:

  bottleneck symbols (exact) -> C2..C5 -> FPN P2..P6 -> RPN head maps,
  plus the box head + predictor on a fixed pooled tensor (pinning fc6's
  NCHW->NHWC flatten-order permutation).

Proposal selection/NMS are not replicated in torch — those semantics are
pinned against in-repo oracles in `test_detection.py`; this file pins the
LEARNED tensor path a converted reference checkpoint would flow through.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.models.detection.base import (  # noqa: E402
    SplittableDetectionBackbone)
from sc2bench_tpu.models.detection.rcnn import FasterRCNN  # noqa: E402
from sc2bench_tpu.models.layer import FPBasedResNetBottleneck  # noqa: E402
from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    DETECTION_RULES, DETECTION_WEIGHT_TRANSFORMS, convert_state_dict,
    merge_into_variables)
from sc2bench_tpu.utils.torch_ref_model import (  # noqa: E402
    TorchSplittableFasterRCNN, randomize_for_parity,
    torch_box_head_forward, torch_detection_stage_forward)

BCH, TARGET, STAGES, K, HW = 8, 256, (1, 1, 1, 1), 5, 64


def _nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


@pytest.fixture(scope='module')
def det_pipelines():
    tm = randomize_for_parity(
        TorchSplittableFasterRCNN(bch=BCH, target=TARGET,
                                  stage_sizes=STAGES, num_classes=K),
        seed=21)
    _, _, _, medians = \
        tm.backbone.body.bottleneck_layer.entropy_bottleneck.update()

    fm = FasterRCNN(
        backbone=SplittableDetectionBackbone(
            bottleneck_layer=FPBasedResNetBottleneck(
                num_bottleneck_channels=BCH, num_target_channels=TARGET),
            stage_sizes=STAGES),
        num_classes=K)
    x0 = jnp.zeros((1, HW, HW, 3))
    variables = jax.jit(lambda r, x: fm.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(
        tm.state_dict(), DETECTION_RULES,
        weight_transforms=DETECTION_WEIGHT_TRANSFORMS)
    variables = merge_into_variables(variables, converted)
    return tm, medians, fm, variables


def test_detection_rules_cover_every_torch_key(det_pipelines):
    """Every leaf of the reference-key-space state dict must be claimed by
    a DETECTION_RULES pattern (or be a rebuilt coding-table buffer) — a
    converted checkpoint may not silently drop weights."""
    import re
    tm, *_ = det_pipelines
    skip_leaves = {'_quantized_cdf', '_offset', '_cdf_length',
                   'scale_table', 'num_batches_tracked', 'mask'}
    for key in tm.state_dict():
        path, _, leaf = key.rpartition('.')
        if leaf in skip_leaves:
            continue
        assert any(re.fullmatch(p, path) for p, r in DETECTION_RULES
                   if r is not None), f'unmatched torch key: {key}'


def test_detection_stage_parity(det_pipelines):
    """Converted weights: identical bottleneck symbols, matching C2..C5,
    FPN P2..P6, and per-level RPN maps across frameworks."""
    tm, medians, fm, variables = det_pipelines
    rng = np.random.default_rng(23)
    img = rng.normal(0, 1, (1, HW, HW, 3)).astype(np.float32)
    t_sym, t_cs, t_ps, t_rpn = torch_detection_stage_forward(
        tm, medians, np.transpose(img, (0, 3, 1, 2)).copy())

    body_feats = fm.apply(
        variables, jnp.asarray(img),
        method=lambda m, x: m.backbone(x, mode='finetune', train=False))
    feats = fm.apply(variables, body_feats,
                     method=lambda m, f: m.fpn(f))
    # bottleneck symbols must agree EXACTLY (integer round of y - medians)
    enc = fm.apply(variables, jnp.asarray(img), jnp.asarray(medians),
                   method=lambda m, x, med:
                   m.backbone.bottleneck_layer.encode_ops(x, med))
    np.testing.assert_array_equal(
        np.transpose(np.asarray(enc['symbols']), (0, 3, 1, 2)), t_sym)
    for name, f_j, f_t in zip(('C2', 'C3', 'C4', 'C5'), body_feats, t_cs):
        np.testing.assert_allclose(np.asarray(f_j), _nhwc(f_t),
                                   rtol=2e-3, atol=2e-3, err_msg=name)
    assert len(feats) == len(t_ps) == 5
    for i, (f_j, f_t) in enumerate(zip(feats, t_ps)):
        np.testing.assert_allclose(np.asarray(f_j), _nhwc(f_t),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f'P{i + 2}')
    cls_j, reg_j = fm.apply(variables, feats,
                            method=lambda m, f: m.rpn_head(f))
    for i, (t_cls, t_reg) in enumerate(t_rpn):
        np.testing.assert_allclose(np.asarray(cls_j[i]), _nhwc(t_cls),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f'rpn cls level {i}')
        np.testing.assert_allclose(np.asarray(reg_j[i]), _nhwc(t_reg),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f'rpn reg level {i}')


def test_detection_box_head_parity(det_pipelines):
    """fc6/fc7 + predictor on a fixed pooled tensor: the fc6 conversion
    must account for torch flattening pooled RoIs in NCHW order while the
    flax head flattens NHWC."""
    tm, _, fm, variables = det_pipelines
    rng = np.random.default_rng(29)
    pooled = rng.normal(0, 1, (6, 7, 7, 256)).astype(np.float32)
    t_scores, t_deltas = torch_box_head_forward(
        tm, np.transpose(pooled, (0, 3, 1, 2)).copy())
    s_j, d_j = fm.apply(
        variables, jnp.asarray(pooled),
        method=lambda m, p: m.box_predictor(m.box_head(p)))
    np.testing.assert_allclose(np.asarray(s_j), t_scores,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_j), t_deltas,
                               rtol=2e-3, atol=2e-3)


def test_mask_head_parity():
    """Mask head + predictor (torchvision>=0.15 Conv2dNormActivation key
    space) converts and matches on a fixed pooled tensor."""
    import re
    from sc2bench_tpu.models.detection.heads import MaskHead
    from sc2bench_tpu.utils.torch_convert import (MASKRCNN_DECONV_PATHS,
                                                  MASKRCNN_RULES)
    from sc2bench_tpu.utils.torch_ref_model import (
        TorchSplittableMaskRCNN, torch_mask_head_forward)
    tm = randomize_for_parity(
        TorchSplittableMaskRCNN(bch=BCH, target=TARGET,
                                stage_sizes=STAGES, num_classes=K),
        seed=41)
    skip = {'_quantized_cdf', '_offset', '_cdf_length', 'scale_table',
            'num_batches_tracked', 'mask'}
    for key in tm.state_dict():
        path, _, leaf = key.rpartition('.')
        if leaf in skip:
            continue
        assert any(re.fullmatch(p, path) for p, r in MASKRCNN_RULES
                   if r is not None), f'unmatched torch key: {key}'
    head = MaskHead(num_classes=K)
    pooled = np.random.default_rng(43).normal(
        0, 1, (3, 14, 14, 256)).astype(np.float32)
    variables = jax.jit(head.init)(jax.random.key(0), jnp.asarray(pooled))
    conv = convert_state_dict(tm.state_dict(), MASKRCNN_RULES,
                              deconv_paths=MASKRCNN_DECONV_PATHS)
    variables = merge_into_variables(
        variables, {'params': conv['params']['mask_head']})
    f_logits = head.apply(variables, jnp.asarray(pooled))
    t_logits = torch_mask_head_forward(
        tm, np.transpose(pooled, (0, 3, 1, 2)).copy())
    np.testing.assert_allclose(np.asarray(f_logits), _nhwc(t_logits),
                               rtol=2e-3, atol=2e-3)


def test_keypoint_head_parity():
    """Keypoint head + predictor (flat Sequential key space, deconv +
    2x bilinear upsample) converts and matches on a fixed pooled tensor."""
    import re
    from sc2bench_tpu.models.detection.heads import KeypointHead
    from sc2bench_tpu.utils.torch_convert import (
        KEYPOINTRCNN_DECONV_PATHS, KEYPOINTRCNN_RULES)
    from sc2bench_tpu.utils.torch_ref_model import (
        TorchSplittableKeypointRCNN, torch_keypoint_head_forward)
    tm = randomize_for_parity(
        TorchSplittableKeypointRCNN(bch=BCH, target=TARGET,
                                    stage_sizes=STAGES, num_classes=K,
                                    num_keypoints=17),
        seed=47)
    skip = {'_quantized_cdf', '_offset', '_cdf_length', 'scale_table',
            'num_batches_tracked', 'mask'}
    for key in tm.state_dict():
        path, _, leaf = key.rpartition('.')
        if leaf in skip:
            continue
        assert any(re.fullmatch(p, path) for p, r in KEYPOINTRCNN_RULES
                   if r is not None), f'unmatched torch key: {key}'
    head = KeypointHead(num_keypoints=17)
    pooled = np.random.default_rng(53).normal(
        0, 1, (2, 14, 14, 256)).astype(np.float32)
    variables = jax.jit(head.init)(jax.random.key(0), jnp.asarray(pooled))
    conv = convert_state_dict(tm.state_dict(), KEYPOINTRCNN_RULES,
                              deconv_paths=KEYPOINTRCNN_DECONV_PATHS)
    variables = merge_into_variables(
        variables, {'params': conv['params']['keypoint_head']})
    f_maps = head.apply(variables, jnp.asarray(pooled))
    t_maps = torch_keypoint_head_forward(
        tm, np.transpose(pooled, (0, 3, 1, 2)).copy())
    np.testing.assert_allclose(np.asarray(f_maps), _nhwc(t_maps),
                               rtol=2e-3, atol=2e-3)


def test_detection_deploy_bitstream_and_detections_match(det_pipelines):
    """Item: full deploy parity through the wire. Converted weights →
    encode → channel-major rANS bitstream (byte-identical to torch) →
    decode → FPN/RPN/RoI → postprocess: boxes/scores/labels must match
    the torchvision-eval-semantics numpy oracle (reference eval path
    `/root/reference/sc2bench/models/backbone.py:130-144` +
    `detection/base.py:98-101`)."""
    from sc2bench_tpu.models.detection.wrapper import SplitDetectionRuntime
    from sc2bench_tpu.ops.rans.coder import RansCoder
    from sc2bench_tpu.utils.torch_ref_model import (
        torch_deploy_forward_detection)
    tm, medians, fm, variables = det_pipelines
    cdf, cdf_len, off, _ = \
        tm.backbone.body.bottleneck_layer.entropy_bottleneck.update()
    coder = RansCoder(cdf, cdf_len, off)
    rt = SplitDetectionRuntime(fm, variables)
    assert rt.update()
    np.testing.assert_array_equal(rt.codec.tables.quantized_cdf, cdf)

    rng = np.random.default_rng(31)
    img = rng.normal(0, 1, (1, HW, HW, 3)).astype(np.float32)
    t_boxes, t_scores, t_labels, t_bits = torch_deploy_forward_detection(
        tm, coder, medians, np.transpose(img, (0, 3, 1, 2)).copy(),
        anchor_sizes=fm.anchor_sizes, aspect_ratios=fm.aspect_ratios)

    # (a) protocol-format feature bitstream: byte-identical
    enc = fm.apply(variables, jnp.asarray(img), jnp.asarray(medians),
                   method=lambda m, x, med: m.encode_ops(x, med))
    strings = rt.codec.compress_symbols(np.asarray(enc['symbols']))
    assert strings[0] == t_bits, 'feature bitstream mismatch'

    # (b) postprocessed detections through the deploy wire
    dets = rt.detect(img)
    valid = np.asarray(dets['valid'][0])
    f_boxes = np.asarray(dets['boxes'][0])[valid]
    f_scores = np.asarray(dets['scores'][0])[valid]
    f_labels = np.asarray(dets['labels'][0])[valid]
    assert len(f_boxes) == len(t_boxes), \
        f'detection count {len(f_boxes)} vs torch {len(t_boxes)}'
    np.testing.assert_array_equal(f_labels, t_labels)
    np.testing.assert_allclose(f_scores, t_scores, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(f_boxes, t_boxes, rtol=0, atol=5e-2)
