"""Segmentation base: backbone dict-features → head → bilinear upsample.

Parity surface of `/root/reference/sc2bench/models/segmentation/base.py`:
`BaseSegmentationModel` runs the (splittable) backbone to 'out'/'aux'
feature maps, applies the classifier (+aux) heads, and upsamples to input
resolution (`base.py:66-82`). TPU notes: upsampling is `jax.image.resize`
(fused by XLA); the backbone is dilated so 'out' is stride 8.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BaseSegmentationModel(nn.Module):
    """backbone (features dict) + classifier head (+ aux head)."""

    backbone: nn.Module
    classifier: nn.Module
    aux_classifier: Optional[nn.Module] = None

    def __call__(self, x, mode: str = 'train', train: bool = False):
        input_hw = x.shape[1:3]
        features = self.backbone(x, mode=mode, train=train)
        out = self.classifier(features['out'], train=train)
        out = jax.image.resize(
            out, (out.shape[0], *input_hw, out.shape[-1]), 'bilinear')
        result = {'out': out}
        if self.aux_classifier is not None and 'aux' in features:
            aux = self.aux_classifier(features['aux'], train=train)
            aux = jax.image.resize(
                aux, (aux.shape[0], *input_hw, aux.shape[-1]), 'bilinear')
            result['aux'] = aux
        return result

    # -- deploy split (runtime duck-typing like SplittableResNet) ---------
    def encode_ops(self, x, medians):
        return self.backbone.bottleneck_layer.encode_ops(x, medians)

    def decode_ops_to_output(self, symbols, medians, input_hw):
        feature = self.backbone.bottleneck_layer.decode_ops(symbols, medians)
        features = self.backbone.forward_tail(feature)
        out = self.classifier(features['out'], train=False)
        return jax.image.resize(
            out, (out.shape[0], *input_hw, out.shape[-1]), 'bilinear')


class SegmentationBackboneFeatures(nn.Module):
    """Wraps a splittable (or plain) ResNet body into the dict-feature
    contract ('out' = layer4, 'aux' = layer3), with dilated layer3/4
    (torchvision deeplabv3 semantics). The bottleneck replaces stem+layer1
    exactly as in classification (reference `segmentation/base.py:42-65` via
    `FeatureExtractionBackbone`)."""

    bottleneck_layer: Optional[nn.Module] = None
    stage_sizes: tuple = (3, 4, 6, 3)
    return_aux: bool = True
    dtype: Any = jnp.float32  # stage compute dtype (bf16 serving); the
    #                           bottleneck keeps its own dtype

    def setup(self):
        from ..resnet import ResNetStage, ResNetStem
        d = self.dtype
        if self.bottleneck_layer is None:
            self.stem = ResNetStem(dtype=d)
            self.layer1 = ResNetStage(64, self.stage_sizes[0], strides=1,
                                      dtype=d)
        self.layer2 = ResNetStage(128, self.stage_sizes[1], strides=2,
                                  dtype=d)
        self.layer3 = ResNetStage(256, self.stage_sizes[2], strides=2,
                                  dilation=1, dilate=True, dtype=d)
        self.layer4 = ResNetStage(512, self.stage_sizes[3], strides=2,
                                  dilation=2, dilate=True, dtype=d)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        if self.bottleneck_layer is not None:
            z = self.bottleneck_layer(x, mode=mode, train=train)
            self.sow('intermediates', 'bottleneck_layer_out', z)
        else:
            z = self.layer1(self.stem(x, train), train)
            self.sow('intermediates', 'layer1_out', z)
        z = self.layer2(z, train)
        self.sow('intermediates', 'layer2_out', z)
        z = self.layer3(z, train)
        self.sow('intermediates', 'layer3_out', z)
        features = {}
        if self.return_aux:
            features['aux'] = z
        z = self.layer4(z, train)
        self.sow('intermediates', 'layer4_out', z)
        features['out'] = z
        return features

    # deploy-path pieces for the splittable variant
    def forward_tail(self, feature, train: bool = False):
        z = self.layer2(feature, train)
        z = self.layer3(z, train)
        features = {}
        if self.return_aux:
            features['aux'] = z
        features['out'] = self.layer4(z, train)
        return features


def check_if_updatable_segmentation_model(model) -> bool:
    return hasattr(model, 'update') and hasattr(model, 'backbone')
