"""Splittable classification backbones.

Re-design of `/root/reference/sc2bench/models/backbone.py`: the stem+layer1
of a ResNet (or variant) is replaced by a learned bottleneck layer; layer2-4
and the classifier head form the server-side tail. The reference's
`bottleneck_updated` mutable flag + in-module branching (`backbone.py:225-254`)
becomes a `mode` argument ('train' | 'finetune') over pure functions, with
the deploy bitstream path handled by `models/runtime.py` (encode→rANS→decode
as two separately jitted XLA programs — the mobile/edge split realized as a
compilation boundary).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import register_model
from .layer import get_layer
from .resnet import ResNetStage

ModuleDef = Any


class SplittableResNet(nn.Module):
    """Bottleneck layer + ResNet layer2-4 + avgpool/fc
    (reference `backbone.py:190-276`). Works for ResNet-50/101/152 and
    ResNeSt via `stage_sizes`; `skips_avgpool/fc` supports the detection/
    segmentation backbones that only need features."""

    bottleneck_layer: nn.Module
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    skips_avgpool: bool = False
    skips_fc: bool = False
    sow_intermediates: bool = True
    dtype: Any = jnp.float32  # tail compute dtype (bfloat16 → MXU)
    frozen_bn: bool = False   # reference `backbone.py:690-698` option

    def setup(self):
        d, fb = self.dtype, self.frozen_bn
        self.layer2 = ResNetStage(128, self.stage_sizes[1], strides=2,
                                  dtype=d, frozen_bn=fb)
        self.layer3 = ResNetStage(256, self.stage_sizes[2], strides=2,
                                  dtype=d, frozen_bn=fb)
        self.layer4 = ResNetStage(512, self.stage_sizes[3], strides=2,
                                  dtype=d, frozen_bn=fb)
        if not (self.skips_avgpool and self.skips_fc):
            self.fc = nn.Dense(self.num_classes)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        return self.forward_tail(z, train=train, sow=self.sow_intermediates)

    def forward_tail(self, feature, train: bool = False, sow: bool = False):
        """Server-side tail from a decoded bottleneck feature — the second
        jitted program of the deploy split."""
        z = feature
        for i, stage in ((2, self.layer2), (3, self.layer3),
                         (4, self.layer4)):
            z = stage(z, train)
            if sow:
                self.sow('intermediates', f'layer{i}_out', z)
        if self.skips_avgpool:
            return z
        z = jnp.mean(z, axis=(1, 2))
        if self.skips_fc:
            return z
        return self.fc(z)


@register_model(name='resnet')
def resnet_builder(stage_sizes=(3, 4, 6, 3), num_classes=1000, **kwargs):
    """Config-resolvable plain ResNet (arbitrary stage sizes — lets tiny
    teachers be declared in YAML for smoke/dryrun configs)."""
    from .resnet import ResNet
    return ResNet(stage_sizes=tuple(stage_sizes), num_classes=num_classes)


@register_model
def splittable_resnet(bottleneck_config, resnet_name='resnet50',
                      num_classes=1000, skips_avgpool=False, skips_fc=False,
                      frozen_bn=False, stage_sizes=None,
                      **kwargs) -> SplittableResNet:
    """Builder (reference `backbone.py:658-698`): bottleneck from the layer
    registry + ResNet tail selected by name; `frozen_bn` mirrors the
    reference's FrozenBatchNorm2d option for detection backbones.
    `stage_sizes` overrides the name-derived tail depth (tiny configs)."""
    stage_sizes = tuple(stage_sizes) if stage_sizes else \
        {'resnet50': (3, 4, 6, 3), 'resnet101': (3, 4, 23, 3),
         'resnet152': (3, 8, 36, 3),
         'resnest50d': (3, 4, 6, 3)}[resnet_name]
    bottleneck = get_layer(bottleneck_config['key'],
                           **bottleneck_config.get('kwargs', {}))
    return SplittableResNet(bottleneck_layer=bottleneck,
                            stage_sizes=stage_sizes, num_classes=num_classes,
                            skips_avgpool=skips_avgpool, skips_fc=skips_fc,
                            frozen_bn=frozen_bn)


@register_model
def splittable_resnest(bottleneck_config, resnest_name='resnest50d',
                       num_classes=1000, skips_avgpool=False, skips_fc=False,
                       **kwargs):
    """ResNeSt variant (reference `backbone.py:786-820`): a true
    split-attention (radix-2) tail from `models/resnest.py`."""
    from .resnest import SplittableResNeSt
    stage_sizes = {'resnest50d': (3, 4, 6, 3),
                   'resnest101e': (3, 4, 23, 3)}[resnest_name]
    bottleneck = get_layer(bottleneck_config['key'],
                           **bottleneck_config.get('kwargs', {}))
    return SplittableResNeSt(bottleneck_layer=bottleneck,
                             stage_sizes=stage_sizes,
                             num_classes=num_classes,
                             skips_avgpool=skips_avgpool, skips_fc=skips_fc)


class SplittableDenseNet(nn.Module):
    """Bottleneck + DenseNet transition2/denseblock3.. tail
    (reference `backbone.py:279-372`)."""

    bottleneck_layer: nn.Module
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 32, 32)
    num_init_features: int = 64
    num_classes: int = 1000
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        # DenseNet tail: blocks 3..4 with transitions, then classifier.
        num_features = z.shape[-1]
        for bi, num_layers in enumerate(self.block_config[2:], start=3):
            for li in range(num_layers):
                y = norm(name=f'block{bi}_l{li}_bn1')(z)
                y = nn.relu(y)
                y = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False,
                            name=f'block{bi}_l{li}_conv1')(y)
                y = norm(name=f'block{bi}_l{li}_bn2')(y)
                y = nn.relu(y)
                y = nn.Conv(self.growth_rate, (3, 3),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            name=f'block{bi}_l{li}_conv2')(y)
                z = jnp.concatenate([z, y], axis=-1)
            if bi != len(self.block_config):
                num_features = z.shape[-1] // 2
                z = norm(name=f'trans{bi}_bn')(z)
                z = nn.relu(z)
                z = nn.Conv(num_features, (1, 1), use_bias=False,
                            name=f'trans{bi}_conv')(z)
                z = nn.avg_pool(z, (2, 2), strides=(2, 2))
        z = norm(name='final_bn')(z)
        z = nn.relu(z)
        z = jnp.mean(z, axis=(1, 2))
        return nn.Dense(self.num_classes, name='classifier')(z)


@register_model
def splittable_densenet(bottleneck_config, densenet_name='densenet169',
                        num_classes=1000, **kwargs) -> SplittableDenseNet:
    block_config = {'densenet169': (6, 12, 32, 32),
                    'densenet201': (6, 12, 48, 32)}[densenet_name]
    bottleneck = get_layer(bottleneck_config['key'],
                           **bottleneck_config.get('kwargs', {}))
    return SplittableDenseNet(bottleneck_layer=bottleneck,
                              block_config=block_config,
                              num_classes=num_classes)


def get_backbone(key: str, **kwargs):
    """Name→builder resolution (reference `backbone.py:894-909`)."""
    from ..registry import get as registry_get
    return registry_get('model', key)(**kwargs)


def check_if_updatable(model) -> bool:
    """True if the object exposes the updatable contract (reference
    `backbone.py:78-87`): here that is a runtime (or module) with `update`
    and a `bottleneck_updated` flag."""
    return hasattr(model, 'update') and hasattr(model, 'bottleneck_updated')
