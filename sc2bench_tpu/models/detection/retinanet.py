"""RetinaNet over a splittable backbone — TPU-native one-stage detector.

Covers the bottleneck-injected RetinaNet operating points named in
BASELINE.json (the reference realizes detection through torchvision's
detector zoo; its splittable backbone plugs into either detector family).
Same static-shape discipline as rcnn.py: fixed candidate budgets, mask-based
NMS, padded targets. Focal-loss classification + L1 box regression
(torchvision RetinaNet semantics: fg IoU>=0.5, bg<0.4, allow-low-quality
matches).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.boxes import (batched_nms_mask, box_iou, clip_boxes,
                          decode_boxes, encode_boxes,
                          remove_small_boxes_mask)
from ...registry import register_model
from .fpn import generate_anchors

FOCAL_ALPHA, FOCAL_GAMMA = 0.25, 2.0
FG_IOU, BG_IOU = 0.5, 0.4
SCORE_THRESH, NMS_THRESH, DETECTIONS_PER_IMG = 0.05, 0.5, 100
TOPK_PER_LEVEL = 1000


class RetinaFPN(nn.Module):
    """P3-P5 from C3-C5 laterals + P6/P7 extra convs (RetinaNet variant)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]):
        c3, c4, c5 = features
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'inner_{i}')(f)
            for i, f in enumerate((c3, c4, c5))]
        for i in range(1, -1, -1):
            up = jax.image.resize(laterals[i + 1], laterals[i].shape,
                                  'nearest')
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name=f'layer_{i}')(l)
            for i, l in enumerate(laterals)]
        p6 = nn.Conv(self.out_channels, (3, 3), (2, 2), ((1, 1), (1, 1)),
                     name='p6')(c5)
        p7 = nn.Conv(self.out_channels, (3, 3), (2, 2), ((1, 1), (1, 1)),
                     name='p7')(nn.relu(p6))
        return outs + [p6, p7]


class RetinaNetHead(nn.Module):
    num_classes: int = 91
    num_anchors: int = 9

    @nn.compact
    def __call__(self, features):
        cls_convs = [nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                             name=f'cls_conv{i}') for i in range(4)]
        box_convs = [nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                             name=f'box_conv{i}') for i in range(4)]
        # focal-loss prior init: background logit bias -log((1-pi)/pi)
        cls_out = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=((1, 1), (1, 1)),
            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01)
                                                             / 0.01))),
            name='cls_logits')
        box_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=((1, 1), (1, 1)), name='bbox_reg')
        logits, deltas = [], []
        for f in features:
            c = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            logits.append(cls_out(c))
            b = f
            for conv in box_convs:
                b = nn.relu(conv(b))
            deltas.append(box_out(b))
        return logits, deltas


class RetinaNet(nn.Module):
    """backbone (C2..C5) → RetinaFPN (P3..P7) → shared head."""

    backbone: nn.Module
    num_classes: int = 91
    anchor_sizes: Sequence = ((32, 40, 50), (64, 81, 101), (128, 161, 203),
                              (256, 322, 406), (512, 645, 812))
    aspect_ratios: Sequence = (0.5, 1.0, 2.0)

    def setup(self):
        self.fpn = RetinaFPN()
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.aspect_ratios) * len(self.anchor_sizes[0]))

    def __call__(self, x, mode: str = 'train', train: bool = False):
        image_hw = x.shape[1:3]
        body = self.backbone(x, mode=mode, train=train)
        features = self.fpn(body[1:])  # C3..C5
        logits, deltas = self.head(features)
        anchors_np = generate_anchors(
            [f.shape[1:3] for f in features], image_hw,
            sizes=self.anchor_sizes, aspect_ratios=self.aspect_ratios)
        anchors = jnp.asarray(np.concatenate(anchors_np))
        c = self.num_classes
        logit_flat = jnp.concatenate(
            [l.reshape(l.shape[0], -1, c) for l in logits], axis=1)
        delta_flat = jnp.concatenate(
            [d.reshape(d.shape[0], -1, 4) for d in deltas], axis=1)
        level_sizes = [int(np.prod(l.shape[1:3])) * 9 for l in logits]
        return {'anchors': anchors, 'cls_logits': logit_flat,
                'bbox_deltas': delta_flat, 'image_hw': image_hw,
                'level_sizes': level_sizes}


def retinanet_loss(outputs, targets, *_unused):
    """Focal classification + L1 regression over matched anchors."""
    anchors = outputs['anchors']

    def per_image(logits_i, deltas_i, gt_boxes, gt_valid, gt_labels):
        iou = box_iou(anchors, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1, initial=-1.0)
        fg = best_iou >= FG_IOU
        # allow-low-quality: best anchor per gt is fg
        gt_best = jnp.max(iou, axis=0)
        is_best = jnp.any((iou >= gt_best[None, :] - 1e-6) & (iou > 0)
                          & gt_valid[None, :], axis=1)
        fg = fg | is_best
        ignore = (~fg) & (best_iou >= BG_IOU)
        valid = ~ignore
        cls_t = jnp.where(fg, gt_labels[best_gt], 0)
        onehot = jax.nn.one_hot(cls_t, logits_i.shape[-1]) \
            * fg[:, None].astype(logits_i.dtype)
        p = jax.nn.sigmoid(logits_i)
        ce = -(onehot * jnp.log(jnp.clip(p, 1e-8))
               + (1 - onehot) * jnp.log(jnp.clip(1 - p, 1e-8)))
        p_t = onehot * p + (1 - onehot) * (1 - p)
        alpha_t = onehot * FOCAL_ALPHA + (1 - onehot) * (1 - FOCAL_ALPHA)
        focal = alpha_t * (1 - p_t) ** FOCAL_GAMMA * ce
        n_fg = jnp.maximum(jnp.sum(fg), 1)
        cls_loss = jnp.sum(focal * valid[:, None]) / n_fg
        reg_t = encode_boxes(gt_boxes[best_gt], anchors)
        reg_loss = jnp.sum(jnp.abs(deltas_i - reg_t) * fg[:, None]) / n_fg
        return cls_loss, reg_loss

    cls, reg = jax.vmap(per_image)(
        outputs['cls_logits'], outputs['bbox_deltas'],
        targets['boxes'], targets['boxes_valid'], targets['labels'])
    return {'classification': jnp.mean(cls), 'bbox_regression':
            jnp.mean(reg)}


def retinanet_postprocess(outputs, score_thresh=SCORE_THRESH,
                          nms_thresh=NMS_THRESH,
                          detections_per_img=DETECTIONS_PER_IMG):
    """Dense per-image detections (static shapes)."""
    anchors = outputs['anchors']
    image_hw = outputs['image_hw']
    c = outputs['cls_logits'].shape[-1]

    def per_image(logits_i, deltas_i):
        scores = jax.nn.sigmoid(logits_i).reshape(-1)     # (A*C,)
        boxes = decode_boxes(deltas_i, anchors)           # (A, 4)
        boxes = clip_boxes(boxes, image_hw)
        boxes_rep = jnp.repeat(boxes, c, axis=0)
        labels = jnp.tile(jnp.arange(c, dtype=jnp.int32),
                          (anchors.shape[0],))
        ok = (scores > score_thresh) & (labels > 0) \
            & jnp.repeat(remove_small_boxes_mask(boxes, 1e-2), c)
        sel = jnp.where(ok, scores, -1.0)
        cap = min(sel.shape[0], TOPK_PER_LEVEL * 4)
        top_scores, top_idx = jax.lax.top_k(sel, cap)
        idx, keep = batched_nms_mask(boxes_rep[top_idx], top_scores,
                                     labels[top_idx], nms_thresh,
                                     detections_per_img)
        final = top_idx[idx]
        return {'boxes': boxes_rep[final],
                'scores': jnp.where(keep, scores[final], 0.0),
                'labels': labels[final],
                'valid': keep & (scores[final] > score_thresh)}

    return jax.vmap(per_image)(outputs['cls_logits'],
                               outputs['bbox_deltas'])


@register_model
def retinanet_model(backbone_config=None, num_classes=91, **kwargs):
    """Builder: splittable backbone + RetinaNet."""
    from .base import SplittableDetectionBackbone
    backbone = SplittableDetectionBackbone.from_config(backbone_config or {})
    return RetinaNet(backbone=backbone, num_classes=num_classes)
