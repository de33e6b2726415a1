"""Detection backbone abstractions.

Parity surface of `/root/reference/sc2bench/models/detection/base.py`:
`UpdatableBackboneWithFPN` wraps a (splittable) classification body whose
per-stage features feed the FPN (`base.py:44-129`). Here the body returns
the C2..C5 list; FPN lives in FasterRCNN (rcnn.py). The bottleneck replaces
stem+layer1 exactly as in classification.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layer import get_layer
from ..resnet import ResNetStage, ResNetStem


class SplittableDetectionBackbone(nn.Module):
    """(bottleneck | stem+layer1) + layer2-4, returning [C2, C3, C4, C5]."""

    bottleneck_layer: Optional[nn.Module] = None
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    # FrozenBatchNorm in the ResNet stages — the reference's torchvision
    # detection-backbone default (`backbone.py:690-698`)
    frozen_bn: bool = False
    dtype: Any = jnp.float32  # stage compute dtype (bf16 deploy/serving);
    #                           the bottleneck keeps its own dtype (f32
    #                           default) for exact reconstruction

    def setup(self):
        fb, d = self.frozen_bn, self.dtype
        if self.bottleneck_layer is None:
            self.stem = ResNetStem(dtype=d)
            self.layer1 = ResNetStage(64, self.stage_sizes[0], strides=1,
                                      frozen_bn=fb, dtype=d)
        self.layer2 = ResNetStage(128, self.stage_sizes[1], strides=2,
                                  frozen_bn=fb, dtype=d)
        self.layer3 = ResNetStage(256, self.stage_sizes[2], strides=2,
                                  frozen_bn=fb, dtype=d)
        self.layer4 = ResNetStage(512, self.stage_sizes[3], strides=2,
                                  frozen_bn=fb, dtype=d)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        if self.bottleneck_layer is not None:
            c2 = self.bottleneck_layer(x, mode=mode, train=train)
            self.sow('intermediates', 'bottleneck_layer_out', c2)
        else:
            c2 = self.layer1(self.stem(x, train), train)
            self.sow('intermediates', 'layer1_out', c2)
        c3 = self.layer2(c2, train)
        self.sow('intermediates', 'layer2_out', c3)
        c4 = self.layer3(c3, train)
        self.sow('intermediates', 'layer3_out', c4)
        c5 = self.layer4(c4, train)
        self.sow('intermediates', 'layer4_out', c5)
        return [c2, c3, c4, c5]

    def forward_tail(self, c2, train: bool = False):
        """Server-side features from a decoded bottleneck output."""
        c3 = self.layer2(c2, train)
        c4 = self.layer3(c3, train)
        c5 = self.layer4(c4, train)
        return [c2, c3, c4, c5]

    @classmethod
    def from_config(cls, backbone_config, **kwargs):
        bottleneck = None
        bcfg = backbone_config.get('bottleneck_config') if backbone_config \
            else None
        if bcfg:
            bottleneck = get_layer(bcfg['key'], **bcfg.get('kwargs', {}))
        stage_sizes = {'resnet50': (3, 4, 6, 3),
                       'resnet101': (3, 4, 23, 3)}[
            (backbone_config or {}).get('resnet_name', 'resnet50')]
        kwargs.setdefault('frozen_bn',
                          (backbone_config or {}).get('frozen_bn', False))
        return cls(bottleneck_layer=bottleneck, stage_sizes=stage_sizes,
                   **kwargs)


def check_if_updatable_detection_model(model) -> bool:
    """Reference `base.py:132-141`."""
    return hasattr(model, 'update')
