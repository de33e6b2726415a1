"""DeepLabv3 heads + model builder.

Parity surface of `/root/reference/sc2bench/models/segmentation/deeplabv3.py`:
`create_deeplabv3` (DeepLabHead + optional FCNHead aux, `deeplabv3.py:19-41`)
and the `deeplabv3_model` builder over a splittable backbone
(`deeplabv3.py:44-104`). ASPP rates (12, 24, 36), 21 PASCAL VOC classes.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import register_model
from ..layer import get_layer
from .base import BaseSegmentationModel, SegmentationBackboneFeatures


class ASPPConv(nn.Module):
    out_ch: int
    rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = self.rate
        x = nn.Conv(self.out_ch, (3, 3), padding=((r, r), (r, r)),
                    kernel_dilation=(r, r), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name='bn')(x, use_running_average=not train)
        return nn.relu(x)


class ASPPPooling(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv')(y)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name='bn')(y, use_running_average=not train)
        y = nn.relu(y)
        return jnp.broadcast_to(y, (x.shape[0], *hw, self.out_ch))


class ASPP(nn.Module):
    out_ch: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        branches = []
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=d,
                    name='b0_conv')(x)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d, name='b0_bn')(
            y, use_running_average=not train)
        branches.append(nn.relu(y))
        for i, rate in enumerate(self.rates):
            branches.append(ASPPConv(self.out_ch, rate, dtype=d,
                                     name=f'b{i + 1}')(x, train))
        branches.append(ASPPPooling(self.out_ch, dtype=d,
                                    name='pool')(x, train))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=d,
                    name='proj_conv')(y)
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d,
                         name='proj_bn')(y, use_running_average=not train)
        y = nn.relu(y)
        # torchvision applies Dropout(0.5) here; deterministic in eval.
        return y


class DeepLabHead(nn.Module):
    """ASPP + 3x3 conv + classifier conv (torchvision DeepLabHead).
    `dtype=bfloat16` runs the convs at MXU rate; the classifier logits
    are cast back to float32 (argmax/softmax stay exact enough)."""

    num_classes: int = 21
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ASPP(dtype=d, name='aspp')(x, train)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=d, name='conv')(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d, name='bn')(
            x, use_running_average=not train)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=d,
                       name='classifier')(x).astype(jnp.float32)


class FCNHead(nn.Module):
    """Aux head: 3x3 conv (channels/4) + classifier."""

    num_classes: int = 21
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 4
        x = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name='bn')(x, use_running_average=not train)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name='classifier')(x).astype(jnp.float32)


def create_deeplabv3(backbone, num_classes=21, uses_aux=False,
                     dtype=jnp.float32):
    """Assemble heads over a feature backbone (reference
    `deeplabv3.py:19-41`)."""
    return BaseSegmentationModel(
        backbone=backbone,
        classifier=DeepLabHead(num_classes=num_classes, dtype=dtype),
        aux_classifier=FCNHead(num_classes=num_classes, dtype=dtype)
        if uses_aux else None)


@register_model
def deeplabv3_model(bottleneck_config=None, backbone_name='resnet50',
                    num_classes=21, uses_aux=False, num_input_channels=3,
                    dtype=None, **kwargs):
    """Builder (reference `deeplabv3.py:44-104`): splittable (bottlenecked)
    or plain dilated ResNet backbone + DeepLab heads. `dtype='bfloat16'`
    runs stages + heads in bf16 (logits cast back to f32; the bottleneck
    keeps its own dtype for exact reconstruction)."""
    stage_sizes = {'resnet50': (3, 4, 6, 3),
                   'resnet101': (3, 4, 23, 3)}[backbone_name]
    d = jnp.dtype(dtype) if dtype else jnp.float32
    bottleneck = None
    if bottleneck_config:
        bottleneck = get_layer(bottleneck_config['key'],
                               **bottleneck_config.get('kwargs', {}))
    backbone = SegmentationBackboneFeatures(
        bottleneck_layer=bottleneck, stage_sizes=stage_sizes,
        return_aux=uses_aux, dtype=d)
    return create_deeplabv3(backbone, num_classes, uses_aux, dtype=d)
