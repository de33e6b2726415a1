"""Flax InceptionV3 tail for the splittable Inception family.

Native NHWC implementation of the torchvision InceptionV3 blocks that form
the server-side tail in `/root/reference/sc2bench/models/backbone.py:375-484`
(`SplittableInceptionV3`: bottleneck replaces everything up to Mixed_5b's
input; tail = Mixed_5b..Mixed_7c + avgpool + fc).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import register_model
from .layer import get_layer


class BasicConv(nn.Module):
    out_ch: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, tuple(self.kernel), tuple(self.strides),
                    self.padding, use_bias=False, name='conv')(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name='bn')(
            x, use_running_average=not train)
        return nn.relu(x)


def _pad(k):
    return tuple((kk // 2, kk // 2) for kk in k)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv(64, (1, 1), name='b1')(x, train)
        b5 = BasicConv(48, (1, 1), name='b5_1')(x, train)
        b5 = BasicConv(64, (5, 5), padding=_pad((5, 5)), name='b5_2')(b5, train)
        b3 = BasicConv(64, (1, 1), name='b3_1')(x, train)
        b3 = BasicConv(96, (3, 3), padding=_pad((3, 3)), name='b3_2')(b3, train)
        b3 = BasicConv(96, (3, 3), padding=_pad((3, 3)), name='b3_3')(b3, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        bp = BasicConv(self.pool_features, (1, 1), name='bp')(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv(384, (3, 3), (2, 2), name='b3')(x, train)
        bd = BasicConv(64, (1, 1), name='bd_1')(x, train)
        bd = BasicConv(96, (3, 3), padding=_pad((3, 3)), name='bd_2')(bd, train)
        bd = BasicConv(96, (3, 3), (2, 2), name='bd_3')(bd, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name='b1')(x, train)
        b7 = BasicConv(c7, (1, 1), name='b7_1')(x, train)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name='b7_2')(b7, train)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name='b7_3')(b7, train)
        bd = BasicConv(c7, (1, 1), name='bd_1')(x, train)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name='bd_2')(bd, train)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name='bd_3')(bd, train)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name='bd_4')(bd, train)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name='bd_5')(bd, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name='bp')(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv(192, (1, 1), name='b3_1')(x, train)
        b3 = BasicConv(320, (3, 3), (2, 2), name='b3_2')(b3, train)
        b7 = BasicConv(192, (1, 1), name='b7_1')(x, train)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name='b7_2')(b7, train)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name='b7_3')(b7, train)
        b7 = BasicConv(192, (3, 3), (2, 2), name='b7_4')(b7, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv(320, (1, 1), name='b1')(x, train)
        b3 = BasicConv(384, (1, 1), name='b3_1')(x, train)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name='b3_2a')(b3, train)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name='b3_2b')(b3, train)
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = BasicConv(448, (1, 1), name='bd_1')(x, train)
        bd = BasicConv(384, (3, 3), padding=_pad((3, 3)), name='bd_2')(bd, train)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name='bd_3a')(bd, train)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name='bd_3b')(bd, train)
        bd = jnp.concatenate([bda, bdb], -1)
        bp = nn.avg_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name='bp')(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], -1)


class SplittableInceptionV3(nn.Module):
    """Bottleneck + Mixed_5b..7c tail (reference `backbone.py:375-484`)."""

    bottleneck_layer: nn.Module
    num_classes: int = 1000
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        z = InceptionA(32, name='Mixed_5b')(z, train)
        z = InceptionA(64, name='Mixed_5c')(z, train)
        z = InceptionA(64, name='Mixed_5d')(z, train)
        z = InceptionB(name='Mixed_6a')(z, train)
        z = InceptionC(128, name='Mixed_6b')(z, train)
        z = InceptionC(160, name='Mixed_6c')(z, train)
        z = InceptionC(160, name='Mixed_6d')(z, train)
        z = InceptionC(192, name='Mixed_6e')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'Mixed_6e_out', z)
        z = InceptionD(name='Mixed_7a')(z, train)
        z = InceptionE(name='Mixed_7b')(z, train)
        z = InceptionE(name='Mixed_7c')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'Mixed_7c_out', z)
        z = jnp.mean(z, axis=(1, 2))
        return nn.Dense(self.num_classes, name='fc')(z)


@register_model
def splittable_inception_v3(bottleneck_config, num_classes=1000, **kwargs):
    """Builder (reference `backbone.py:742-783`)."""
    bottleneck = get_layer(bottleneck_config['key'],
                           **bottleneck_config.get('kwargs', {}))
    return SplittableInceptionV3(bottleneck_layer=bottleneck,
                                 num_classes=num_classes)
