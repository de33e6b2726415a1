"""Mask and keypoint heads extending Faster R-CNN.

Parity with the reference hub constructors `custom_maskrcnn_resnet_fpn` /
`custom_keypointrcnn_resnet_fpn` (`/root/reference/hubconf.py:176-246`),
which wrap torchvision's Mask/Keypoint R-CNN over the bottleneck-injected
backbone. Same static-shape discipline: heads run on the fixed detection
budget; losses sample a fixed foreground set with masks.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import multiscale_roi_align


class MaskHead(nn.Module):
    """4x conv3x3(256) + 2x deconv + per-class 1x1 (torchvision
    MaskRCNNHeads + MaskRCNNPredictor)."""

    num_classes: int = 91

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                name=f'mask_fcn{i + 1}')(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), (2, 2),
                                     name='mask_deconv')(x))
        return nn.Conv(self.num_classes, (1, 1), name='mask_predictor')(x)


class KeypointHead(nn.Module):
    """8x conv3x3(512) + deconv + upsample to 56x56 heatmaps
    (torchvision KeypointRCNNHeads/Predictor)."""

    num_keypoints: int = 17

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i in range(8):
            x = nn.relu(nn.Conv(512, (3, 3), padding=((1, 1), (1, 1)),
                                name=f'kp_fcn{i + 1}')(x))
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), (2, 2),
                             name='kp_deconv')(x)
        return jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
            'bilinear')


def predict_masks(mask_head, variables_scope_apply, features, boxes,
                  image_hw, labels):
    """Per-detection mask probabilities (D, 28, 28) for each box's class.
    `variables_scope_apply(pooled)` applies the bound mask head."""
    scales = [1.0 / (image_hw[0] / f.shape[0]) for f in features]
    pooled = multiscale_roi_align(features, boxes, output_size=14,
                                  scales=scales)
    logits = variables_scope_apply(pooled)             # (D, 28, 28, C)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])  # (D, C)
    per_class = jnp.einsum('dhwc,dc->dhw', logits, onehot)
    return jax.nn.sigmoid(per_class)


def mask_loss(mask_logits, gt_masks_at_rois, fg_mask):
    """BCE between predicted per-class mask logits (D, 28, 28) and gt masks
    roi-aligned to 28x28, averaged over foreground rois."""
    bce = jnp.maximum(mask_logits, 0) - mask_logits * gt_masks_at_rois + \
        jnp.log1p(jnp.exp(-jnp.abs(mask_logits)))
    per_roi = jnp.mean(bce, axis=(1, 2))
    return jnp.sum(per_roi * fg_mask) / jnp.maximum(jnp.sum(fg_mask), 1)
