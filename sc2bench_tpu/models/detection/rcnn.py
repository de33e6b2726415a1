"""Faster R-CNN + FPN over a splittable backbone — TPU-native.

Re-design of `/root/reference/sc2bench/models/detection/rcnn.py` (BaseRCNN /
`create_faster_rcnn_fpn` / `faster_rcnn_model`, `rcnn.py:25-226`, which wrap
torchvision's GeneralizedRCNN). Everything runs with static shapes under jit
(SURVEY.md §7 "hard parts"): fixed proposal budgets, mask-based NMS, padded
ground truth, and fixed per-image detection slots. Returns dense
(boxes, scores, labels, valid) tensors; COCO formatting happens on host.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.boxes import (batched_nms_mask, box_iou, clip_boxes,
                          decode_boxes, encode_boxes, nms_mask,
                          remove_small_boxes_mask)
from ...ops.roi_align import multiscale_roi_align
from ...registry import register_model
from .fpn import FeaturePyramidNetwork, generate_anchors

# torchvision fasterrcnn_resnet50_fpn defaults
RPN_PRE_NMS_TOP_N = {'training': 2000, 'testing': 1000}
RPN_POST_NMS_TOP_N = {'training': 2000, 'testing': 1000}
RPN_NMS_THRESH = 0.7
RPN_FG_IOU, RPN_BG_IOU = 0.7, 0.3
RPN_BATCH_PER_IMAGE, RPN_POSITIVE_FRACTION = 256, 0.5
BOX_SCORE_THRESH, BOX_NMS_THRESH, DETECTIONS_PER_IMG = 0.05, 0.5, 100
BOX_FG_IOU, BOX_BG_IOU = 0.5, 0.5
BOX_BATCH_PER_IMAGE, BOX_POSITIVE_FRACTION = 512, 0.25
BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class RPNHead(nn.Module):
    num_anchors: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; outputs cast to f32
    #                           (box decode needs f32 coordinates)

    @nn.compact
    def __call__(self, features):
        d = self.dtype
        conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name='conv')
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=d, name='cls_logits')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=d,
                      name='bbox_pred')
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls(t).astype(jnp.float32))
            deltas.append(reg(t).astype(jnp.float32))
        return logits, deltas


class TwoMLPHead(nn.Module):
    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name='fc6')(x))
        return nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                                name='fc7')(x))


class FastRCNNPredictor(nn.Module):
    num_classes: int = 91
    dtype: Any = jnp.float32  # outputs cast to f32 (softmax/box decode)

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype,
                          name='cls_score')(x).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name='bbox_pred')(x).astype(jnp.float32)
        return scores, deltas


def _topk_per_level(objectness, levels_sizes, k_per_level):
    """Select top-k anchor indices per level from flat objectness."""
    idxs = []
    offset = 0
    for n, k in zip(levels_sizes, k_per_level):
        scores = jax.lax.dynamic_slice_in_dim(objectness, offset, n)
        k = min(k, n)
        _, top = jax.lax.top_k(scores, k)
        idxs.append(top + offset)
        offset += n
    return jnp.concatenate(idxs)


def propose(objectness, deltas, anchors, level_sizes, image_hw,
            training: bool):
    """Single-image RPN proposal generation (torchvision filter_proposals
    semantics, static shapes). objectness (A,), deltas (A, 4),
    anchors (A, 4). Returns (post_nms, 4) boxes + validity mask."""
    mode = 'training' if training else 'testing'
    pre_k = RPN_PRE_NMS_TOP_N[mode]
    post_k = RPN_POST_NMS_TOP_N[mode]
    k_per_level = [min(pre_k, n) for n in level_sizes]
    keep = _topk_per_level(objectness, level_sizes, k_per_level)
    level_ids = jnp.concatenate([
        jnp.full((k,), i, jnp.int32)
        for i, k in enumerate(k_per_level)])
    scores = jax.nn.sigmoid(objectness[keep])
    boxes = decode_boxes(deltas[keep], anchors[keep])
    boxes = clip_boxes(boxes, image_hw)
    valid = remove_small_boxes_mask(boxes, 1e-3)
    scores = jnp.where(valid, scores, -1.0)
    # level-aware NMS: boxes on different levels never suppress each other
    idx, nms_valid = batched_nms_mask(boxes, scores, level_ids,
                                      RPN_NMS_THRESH, post_k)
    out_boxes = boxes[idx]
    out_valid = nms_valid & (scores[idx] > 0)
    return out_boxes, out_valid


class FasterRCNN(nn.Module):
    """Backbone(+bottleneck) → FPN → RPN → RoI heads. The backbone module
    must return the C2..C5 feature list; FPN lives here (the reference's
    UpdatableBackboneWithFPN composition, `detection/base.py:44-129`)."""

    backbone: nn.Module
    num_classes: int = 91
    anchor_sizes: Sequence = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: Sequence = (0.5, 1.0, 2.0)
    # Compute dtype for FPN/RPN/box heads (bfloat16 -> MXU-rate serving;
    # all box coordinates, scores, and NMS math stay float32 — the heads
    # cast their outputs). The backbone's dtype is its own field.
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        self.fpn = FeaturePyramidNetwork(out_channels=256, dtype=d)
        self.rpn_head = RPNHead(num_anchors=len(self.aspect_ratios),
                                dtype=d)
        self.box_head = TwoMLPHead(dtype=d)
        self.box_predictor = FastRCNNPredictor(
            num_classes=self.num_classes, dtype=d)

    def extract_features(self, x, mode='train', train=False):
        body_feats = self.backbone(x, mode=mode, train=train)
        return self.fpn(body_feats)

    def __call__(self, x, mode: str = 'train', train: bool = False,
                 rpn_only: bool = False):
        """Returns dict with rpn outputs, proposals, and roi predictions —
        dense tensors; losses/postprocess are separate pure fns. With
        `rpn_only` the box head is skipped (the training engine then runs
        it on the sampled-512 proposal set only, torchvision semantics)."""
        image_hw = x.shape[1:3]
        features = self.extract_features(x, mode, train)
        if self.is_initializing():
            rpn_only = False  # materialize box-head params at init
        return self.detect(features, image_hw, train, rpn_only=rpn_only)

    # deploy split: run detection from a decoded bottleneck feature (C2)
    def forward_from_bottleneck(self, c2, image_hw, train: bool = False):
        body_feats = self.backbone.forward_tail(c2, train)
        features = self.fpn(body_feats)
        return self.detect(features, image_hw, train)

    def encode_ops(self, x, medians):
        return self.backbone.bottleneck_layer.encode_ops(x, medians)

    def decode_ops(self, symbols, medians):
        return self.backbone.bottleneck_layer.decode_ops(symbols, medians)

    def detect(self, features, image_hw, train: bool = False,
               rpn_only: bool = False):
        objectness, deltas = self.rpn_head(features)
        level_sizes = [int(np.prod(o.shape[1:3])) * o.shape[3]
                       for o in objectness]
        anchors_np = generate_anchors(
            [f.shape[1:3] for f in features], image_hw,
            sizes=self.anchor_sizes, aspect_ratios=self.aspect_ratios)
        anchors = jnp.asarray(np.concatenate(anchors_np))
        obj_flat = jnp.concatenate(
            [o.reshape(o.shape[0], -1) for o in objectness], axis=1)
        del_flat = jnp.concatenate(
            [d.reshape(d.shape[0], -1, 4) for d in deltas], axis=1)

        def per_image(obj_i, del_i):
            return propose(obj_i, del_i, anchors, level_sizes, image_hw,
                           training=train)

        proposals, prop_valid = jax.vmap(per_image)(obj_flat, del_flat)
        # torchvision decodes proposals from detached RPN deltas: the RoI
        # losses must not optimize coordinates through the RPN head
        proposals = jax.lax.stop_gradient(proposals)
        out = {
            'features': features,
            'anchors': anchors,
            'objectness': obj_flat,
            'rpn_deltas': del_flat,
            'proposals': proposals,
            'proposal_valid': prop_valid,
            'image_hw': image_hw,
        }
        if not rpn_only:
            cls_scores, box_regression = self.roi_predict(
                features, proposals, image_hw)
            out['class_logits'] = cls_scores
            out['box_regression'] = box_regression
        return out

    def roi_predict(self, features, proposals, image_hw):
        """Box head + predictor over (N, R, 4) proposals — callable on the
        full proposal set (eval) or a sampled subset (training, torchvision
        `select_training_samples` semantics)."""
        def roi_per_image(feats_i, props_i):
            pooled = multiscale_roi_align(
                feats_i, props_i, output_size=7,
                scales=[1.0 / (image_hw[0] / f.shape[1])
                        for f in features[:4]])
            rep = self.box_head(pooled)
            return self.box_predictor(rep)

        # vmap over batch: features list -> per-image slices
        cls_scores, box_deltas = jax.vmap(
            lambda fi, pi: roi_per_image(fi, pi))(
            [f for f in features[:4]], proposals)
        return cls_scores, box_deltas.reshape(
            *box_deltas.shape[:-1], self.num_classes, 4)


def postprocess_detections(outputs, score_thresh=BOX_SCORE_THRESH,
                           nms_thresh=BOX_NMS_THRESH,
                           detections_per_img=DETECTIONS_PER_IMG,
                           pre_nms_cap=4096):
    """Dense per-image detections (torchvision RoIHeads.postprocess
    semantics, static shapes). Returns dict of (N, D, ...) arrays.

    `pre_nms_cap` bounds the per-image candidate set entering class-aware
    NMS: the static-shape NMS materializes a cap×cap IoU matrix, and the
    uncapped candidate set is R·(C-1) ≈ 90k (≈32 GB of IoU), so a finite
    cap is required. torchvision NMS-es every candidate above score_thresh
    (0.05), which in practice is far fewer than the cap; crowded images
    could still lose low-score detections — deviation recorded in
    PARITY.md. None = no cap (only safe for tiny class counts)."""
    logits = outputs['class_logits']          # (N, R, C)
    deltas = outputs['box_regression']        # (N, R, C, 4)
    proposals = outputs['proposals']          # (N, R, 4)
    prop_valid = outputs['proposal_valid']
    image_hw = outputs['image_hw']
    n, r, c = logits.shape
    scores = jax.nn.softmax(logits, axis=-1)

    def per_image(scores_i, deltas_i, props_i, valid_i):
        boxes = decode_boxes(deltas_i, props_i[:, None, :],
                             weights=BOX_REG_WEIGHTS)      # (R, C, 4)
        boxes = clip_boxes(boxes, image_hw)
        # drop background column 0
        fg_scores = scores_i[:, 1:].reshape(-1)            # (R*(C-1),)
        fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
        fg_labels = jnp.tile(jnp.arange(1, c, dtype=jnp.int32), (r,))
        ok = (fg_scores > score_thresh) \
            & remove_small_boxes_mask(fg_boxes, 1e-2) \
            & jnp.repeat(valid_i, c - 1)
        sel_scores = jnp.where(ok, fg_scores, -1.0)
        cap = sel_scores.shape[0] if pre_nms_cap is None \
            else min(sel_scores.shape[0], int(pre_nms_cap))
        top_scores, top_idx = jax.lax.top_k(sel_scores, cap)
        idx, keep = batched_nms_mask(fg_boxes[top_idx], top_scores,
                                     fg_labels[top_idx], nms_thresh,
                                     detections_per_img)
        final = top_idx[idx]
        return {
            'boxes': fg_boxes[final],
            'scores': jnp.where(keep, fg_scores[final], 0.0),
            'labels': fg_labels[final],
            'valid': keep & (fg_scores[final] > score_thresh),
        }

    return jax.vmap(per_image)(scores, deltas, proposals, prop_valid)


# ---------------------------------------------------------------------------
# Training losses (torchvision GeneralizedRCNN losses, static shapes)
# ---------------------------------------------------------------------------

def _smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax ** 2 / beta, ax - 0.5 * beta)


def _match_anchors(anchors, gt_boxes, gt_valid, fg_iou, bg_iou,
                   allow_low_quality):
    """Returns (matched_gt_idx, labels) with labels 1 fg / 0 bg / -1 ignore."""
    iou = box_iou(anchors, gt_boxes)               # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1, initial=-1.0)
    labels = jnp.where(best_iou >= fg_iou, 1,
                       jnp.where(best_iou < bg_iou, 0, -1))
    if allow_low_quality:
        # anchors that are argmax for some gt become fg
        gt_best = jnp.max(iou, axis=0)             # (G,)
        is_best = jnp.any(
            (iou >= gt_best[None, :] - 1e-6) & (iou > 0)
            & gt_valid[None, :], axis=1)
        labels = jnp.where(is_best, 1, labels)
    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt, jnp.zeros_like(labels), labels)
    return best_gt, labels


def _sample_mask(labels, rng, batch_size, positive_fraction):
    """Random subsample of fg/bg to fixed budget — returns weight mask."""
    num_pos_target = int(batch_size * positive_fraction)
    pos = labels == 1
    neg = labels == 0
    r1, r2 = jax.random.split(rng)
    pos_scores = jnp.where(pos, jax.random.uniform(r1, labels.shape), -1.0)
    pos_rank = jnp.argsort(jnp.argsort(-pos_scores))
    n_pos = jnp.minimum(jnp.sum(pos), num_pos_target)
    pos_sel = pos & (pos_rank < n_pos)
    n_neg = batch_size - n_pos
    neg_scores = jnp.where(neg, jax.random.uniform(r2, labels.shape), -1.0)
    neg_rank = jnp.argsort(jnp.argsort(-neg_scores))
    neg_sel = neg & (neg_rank < n_neg)
    return pos_sel, neg_sel


def rpn_loss(outputs, targets, rng):
    """targets: dict with 'boxes' (N, G, 4), 'boxes_valid' (N, G)."""
    anchors = outputs['anchors']

    def per_image(obj_i, del_i, gt_boxes, gt_valid, rng_i):
        matched, labels = _match_anchors(anchors, gt_boxes, gt_valid,
                                         RPN_FG_IOU, RPN_BG_IOU, True)
        pos_sel, neg_sel = _sample_mask(labels, rng_i, RPN_BATCH_PER_IMAGE,
                                        RPN_POSITIVE_FRACTION)
        sel = pos_sel | neg_sel
        reg_targets = encode_boxes(gt_boxes[matched], anchors)
        reg = jnp.sum(_smooth_l1(del_i - reg_targets, 1.0 / 9)
                      * pos_sel[:, None]) / jnp.maximum(jnp.sum(sel), 1)
        cls = jnp.sum(
            jnp.where(sel, optax_sigmoid_ce(obj_i, (labels == 1)), 0.0)
        ) / jnp.maximum(jnp.sum(sel), 1)
        return cls, reg

    rngs = jax.random.split(rng, outputs['objectness'].shape[0])
    cls, reg = jax.vmap(per_image)(
        outputs['objectness'], outputs['rpn_deltas'],
        targets['boxes'], targets['boxes_valid'], rngs)
    return jnp.mean(cls), jnp.mean(reg)


def optax_sigmoid_ce(logits, labels):
    labels = labels.astype(logits.dtype)
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


# torchvision fastrcnn_loss smooth-L1 beta
BOX_REG_BETA = 1.0 / 9


def _match_and_sample_rois(props, valid, gt_boxes, gt_valid, gt_labels,
                           rng, batch_size, positive_fraction):
    """Single-image proposal->gt matching + fg/bg subsampling shared by the
    sampled and legacy RoI losses: IoU-0.5 match, class targets (bg=0),
    box regression targets, and the fixed-budget fg/bg selection masks."""
    iou = box_iou(props, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1, initial=-1.0)
    fg = best_iou >= BOX_FG_IOU
    labels01 = jnp.where(fg, 1, jnp.where(valid, 0, -1))
    pos_sel, neg_sel = _sample_mask(labels01, rng, batch_size,
                                    positive_fraction)
    cls_targets = jnp.where(fg, gt_labels[best_gt], 0)
    reg_targets = encode_boxes(gt_boxes[best_gt], props,
                               weights=BOX_REG_WEIGHTS)
    return pos_sel, neg_sel, cls_targets, reg_targets


def _fastrcnn_terms(logits, per_cls_deltas_src, cls_targets, reg_targets,
                    ce_weight, pos_weight, denom):
    """torchvision `fastrcnn_loss`: CE over sampled rows; smooth-L1
    (beta=1/9) summed over positives; both / sampled count."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, cls_targets[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(ce * ce_weight) / denom
    per_cls_deltas = jnp.take_along_axis(
        per_cls_deltas_src, cls_targets[:, None, None].repeat(4, -1),
        axis=1)[:, 0]
    reg_loss = jnp.sum(_smooth_l1(per_cls_deltas - reg_targets, BOX_REG_BETA)
                       * pos_weight[:, None]) / denom
    return cls_loss, reg_loss


def roi_loss(outputs, targets, rng):
    """Fast R-CNN classification + regression loss over sampled proposals.
    NOTE: torchvision samples proposals *before* the box head (use
    `detection_loss(apply_roi=...)` for that); here the head ran on the
    full proposal set and sampling weights the loss — same estimator in
    expectation, static shapes."""
    def per_image(logits_i, deltas_i, props_i, valid_i, gt_boxes, gt_valid,
                  gt_labels, rng_i):
        pos_sel, neg_sel, cls_targets, reg_targets = _match_and_sample_rois(
            props_i, valid_i, gt_boxes, gt_valid, gt_labels, rng_i,
            BOX_BATCH_PER_IMAGE, BOX_POSITIVE_FRACTION)
        sel = pos_sel | neg_sel
        denom = jnp.maximum(jnp.sum(sel), 1)
        return _fastrcnn_terms(logits_i, deltas_i, cls_targets, reg_targets,
                               sel.astype(jnp.float32),
                               pos_sel.astype(jnp.float32), denom)

    rngs = jax.random.split(rng, outputs['class_logits'].shape[0])
    cls, reg = jax.vmap(per_image)(
        outputs['class_logits'], outputs['box_regression'],
        outputs['proposals'], outputs['proposal_valid'],
        targets['boxes'], targets['boxes_valid'], targets['labels'], rngs)
    return jnp.mean(cls), jnp.mean(reg)


def sample_rois(outputs, targets, rng, batch_size=BOX_BATCH_PER_IMAGE,
                positive_fraction=BOX_POSITIVE_FRACTION):
    """torchvision `RoIHeads.select_training_samples` with static shapes:
    per image, append the gt boxes to the proposal set, match at IoU 0.5,
    and subsample a fixed budget (25% positive) — *before* the box head.
    Returns sampled proposals plus their class/regression targets; rows
    past the number actually selected carry weight 0."""
    def per_image(props_i, valid_i, gt_boxes, gt_valid, gt_labels, rng_i):
        all_props = jnp.concatenate([props_i, gt_boxes])
        all_valid = jnp.concatenate([valid_i, gt_valid])
        pos_sel, neg_sel, cls_targets, reg_targets = _match_and_sample_rois(
            all_props, all_valid, gt_boxes, gt_valid, gt_labels, rng_i,
            batch_size, positive_fraction)
        sel = pos_sel | neg_sel
        # stable partition: selected rows first, truncated to the budget
        order = jnp.argsort(~sel, stable=True)[:batch_size]
        return {'proposals': all_props[order],
                'cls_targets': cls_targets[order],
                'reg_targets': reg_targets[order],
                'weight': sel[order].astype(jnp.float32),
                'positive': pos_sel[order]}

    rngs = jax.random.split(rng, outputs['proposals'].shape[0])
    return jax.vmap(per_image)(
        outputs['proposals'], outputs['proposal_valid'],
        targets['boxes'], targets['boxes_valid'], targets['labels'], rngs)


def roi_loss_sampled(class_logits, box_regression, sampled):
    """Fast R-CNN loss over the pre-sampled proposal set (torchvision
    `fastrcnn_loss`)."""
    def per_image(logits_i, deltas_i, s):
        denom = jnp.maximum(jnp.sum(s['weight']), 1.0)
        return _fastrcnn_terms(logits_i, deltas_i, s['cls_targets'],
                               s['reg_targets'], s['weight'],
                               s['positive'].astype(jnp.float32) *
                               s['weight'], denom)

    cls, reg = jax.vmap(per_image)(class_logits, box_regression, sampled)
    return jnp.mean(cls), jnp.mean(reg)


def detection_loss(outputs, targets, rng, apply_roi=None,
                   return_roi_outputs=False):
    """Combined RPN + RoI loss. When `apply_roi(features, proposals) ->
    (class_logits, box_regression)` is given, proposals are subsampled
    *before* the box head (torchvision semantics; pass the model's
    `roi_predict` bound over the train-step variables). Otherwise falls
    back to weighting the full-proposal-set head outputs (same gradient
    estimator in expectation; requires `class_logits` in outputs)."""
    r1, r2 = jax.random.split(rng)
    rpn_cls, rpn_reg = rpn_loss(outputs, targets, r1)
    roi_out = None
    if apply_roi is not None:
        sampled = sample_rois(outputs, targets, r2)
        class_logits, box_regression = apply_roi(outputs['features'],
                                                 sampled['proposals'])
        box_cls, box_reg = roi_loss_sampled(class_logits, box_regression,
                                            sampled)
        roi_out = (class_logits, box_regression)
    else:
        box_cls, box_reg = roi_loss(outputs, targets, r2)
        if 'class_logits' in outputs:
            roi_out = (outputs['class_logits'], outputs['box_regression'])
    losses = {'loss_objectness': rpn_cls, 'loss_rpn_box_reg': rpn_reg,
              'loss_classifier': box_cls, 'loss_box_reg': box_reg}
    return (losses, roi_out) if return_roi_outputs else losses


class MaskRCNN(FasterRCNN):
    """Faster R-CNN + mask head (reference hub `custom_maskrcnn_resnet_fpn`,
    `hubconf.py:210-228`)."""

    def setup(self):
        super().setup()
        from .heads import MaskHead
        self.mask_head = MaskHead(num_classes=self.num_classes)

    def __call__(self, x, mode: str = 'train', train: bool = False,
                 rpn_only: bool = False):
        out = FasterRCNN.__call__(self, x, mode, train, rpn_only)
        if self.is_initializing():
            # materialize the lazily-built mask head params
            self.mask_head(jnp.zeros((1, 14, 14, 256)))
        return out

    def predict_masks(self, features, boxes, labels, image_hw):
        """Per-detection (D, 28, 28) mask probabilities for the predicted
        class of each box. `features` = P2..P5 maps of ONE image."""
        from ...ops.roi_align import multiscale_roi_align
        scales = [1.0 / (image_hw[0] / f.shape[0]) for f in features]
        pooled = multiscale_roi_align(features, boxes, output_size=14,
                                      scales=scales)
        logits = self.mask_head(pooled)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return jax.nn.sigmoid(
            jnp.einsum('dhwc,dc->dhw', logits, onehot))


class KeypointRCNN(FasterRCNN):
    """Faster R-CNN + keypoint head (reference hub
    `custom_keypointrcnn_resnet_fpn`, `hubconf.py:231-246`)."""

    num_keypoints: int = 17

    def setup(self):
        super().setup()
        from .heads import KeypointHead
        self.keypoint_head = KeypointHead(num_keypoints=self.num_keypoints)

    def __call__(self, x, mode: str = 'train', train: bool = False,
                 rpn_only: bool = False):
        out = FasterRCNN.__call__(self, x, mode, train, rpn_only)
        if self.is_initializing():
            self.keypoint_head(jnp.zeros((1, 14, 14, 256)))
        return out

    def predict_keypoints(self, features, boxes, image_hw):
        """(D, 56, 56, K) keypoint heatmaps per detection box."""
        from ...ops.roi_align import multiscale_roi_align
        scales = [1.0 / (image_hw[0] / f.shape[0]) for f in features]
        pooled = multiscale_roi_align(features, boxes, output_size=14,
                                      scales=scales)
        return self.keypoint_head(pooled)


@register_model
def faster_rcnn_model(backbone_config=None, num_classes=91,
                      backbone_fpn_kwargs=None, dtype=None, **kwargs):
    """Builder (reference `rcnn.py:183-226`): splittable backbone from the
    layer/backbone registries + Faster R-CNN. `dtype='bfloat16'` runs the
    backbone stages + FPN + heads in bf16 (box math stays f32; the
    bottleneck keeps its own dtype for exact reconstruction)."""
    from .base import SplittableDetectionBackbone
    d = jnp.dtype(dtype) if dtype else jnp.float32
    backbone = SplittableDetectionBackbone.from_config(
        backbone_config or {}, dtype=d, **(backbone_fpn_kwargs or {}))
    return FasterRCNN(backbone=backbone, num_classes=num_classes, dtype=d)


@register_model
def mask_rcnn_model(backbone_config=None, num_classes=91, **kwargs):
    from .base import SplittableDetectionBackbone
    backbone = SplittableDetectionBackbone.from_config(backbone_config or {})
    return MaskRCNN(backbone=backbone, num_classes=num_classes)


@register_model
def keypoint_rcnn_model(backbone_config=None, num_classes=2,
                        num_keypoints=17, **kwargs):
    from .base import SplittableDetectionBackbone
    backbone = SplittableDetectionBackbone.from_config(backbone_config or {})
    return KeypointRCNN(backbone=backbone, num_classes=num_classes,
                        num_keypoints=num_keypoints)
