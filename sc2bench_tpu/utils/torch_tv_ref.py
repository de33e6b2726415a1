"""Reference-key-space torch replicas: DenseNet / InceptionV3 tails +
tf-EfficientNet (VERDICT r4 item 3).

Like `torch_ref_model.py` / `torch_timm_ref.py`, these deliberately
replicate the torchvision/timm ARCHITECTURES AND KEY SPACES the reference
loads (`/root/reference/sc2bench/models/backbone.py:279-485`,
`registry.py:108-139`, `hubconf.py:82-138`) so `torch_convert.py` rules
can be pinned by cross-framework parity tests without the real packages.
Torch-only on purpose; never imported by the JAX product code.
"""
from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------------------
# GHND SimpleBottleneck from the same spec language as models/layer.py
# ---------------------------------------------------------------------------

def _spec_modules(specs, in_ch):
    """Torch modules for a `models/layer.py:LayerSeq` spec list (the
    reference builds the same lists inline, `layer.py:129-151`)."""
    mods = []
    for spec in specs:
        kind = spec[0]
        if kind == 'conv':
            _, c, k, s, p = spec
            mods.append(nn.Conv2d(in_ch, c, k, s, p, bias=False))
            in_ch = c
        elif kind == 'deconv':
            _, c, k, s = spec
            mods.append(nn.ConvTranspose2d(in_ch, c, k, s, bias=False))
            in_ch = c
        elif kind == 'bn':
            mods.append(nn.BatchNorm2d(in_ch))
        elif kind == 'relu':
            mods.append(nn.ReLU())
        elif kind == 'maxpool':
            _, k, s, p = spec
            mods.append(nn.MaxPool2d(k, s, p))
        elif kind == 'avgpool':
            _, k, s = spec
            mods.append(nn.AvgPool2d(k, s))
        else:
            raise ValueError(kind)
    return nn.Sequential(*mods), in_ch


class TorchSimpleBottleneck(nn.Module):
    """Reference `SimpleBottleneck` (`layer.py:41-105`): encoder/decoder
    Sequentials whose child indices match the spec indices 1:1."""

    def __init__(self, encoder_specs, decoder_specs, in_ch=3):
        super().__init__()
        self.encoder, mid = _spec_modules(encoder_specs, in_ch)
        self.decoder, self.out_ch = _spec_modules(decoder_specs, mid)

    def forward(self, x):
        return self.decoder(self.encoder(x))


# ---------------------------------------------------------------------------
# DenseNet tail (torchvision key space, filtered as the reference's
# SplittableDenseNet does: features.{denseblock3,transition3,denseblock4,
# norm5} + classifier)
# ---------------------------------------------------------------------------

class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, 4 * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(4 * growth)
        self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class _DenseBlock(nn.ModuleDict):
    def __init__(self, num_layers, in_ch, growth):
        super().__init__()
        for i in range(num_layers):
            self.add_module(f'denselayer{i + 1}',
                            _DenseLayer(in_ch + i * growth, growth))

    def forward(self, x):
        for layer in self.values():
            x = layer(x)
        return x


class _Transition(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_ch)
        self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        return F.avg_pool2d(self.conv(F.relu(self.norm(x))), 2, 2)


class TorchSplittableDenseNet(nn.Module):
    """Reference `SplittableDenseNet` (`backbone.py:279-372`) with the
    hub's default short_feature_names (`hubconf.py:85`)."""

    def __init__(self, bottleneck, block_config=(6, 12, 32, 32),
                 growth=32, num_classes=1000):
        super().__init__()
        self.bottleneck_layer = bottleneck
        in_ch = bottleneck.out_ch
        feats = OrderedDict()
        feats['denseblock3'] = _DenseBlock(block_config[2], in_ch, growth)
        n3 = in_ch + block_config[2] * growth
        feats['transition3'] = _Transition(n3, n3 // 2)
        feats['denseblock4'] = _DenseBlock(block_config[3], n3 // 2, growth)
        n4 = n3 // 2 + block_config[3] * growth
        feats['norm5'] = nn.BatchNorm2d(n4)
        self.features = nn.Sequential(feats)
        self.classifier = nn.Linear(n4, num_classes)

    def forward_tail(self, z):
        z = self.features(z)
        z = F.relu(z)
        z = F.adaptive_avg_pool2d(z, (1, 1)).flatten(1)
        return self.classifier(z)

    def forward(self, x):
        return self.forward_tail(self.bottleneck_layer(x))


# ---------------------------------------------------------------------------
# InceptionV3 tail (torchvision key space under `inception_modules.`, as
# the reference's SplittableInceptionV3 stores it, `backbone.py:375-484`)
# ---------------------------------------------------------------------------

class _BasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_ch, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _InceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b5, b3, bp], 1)


class _InceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = _BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch3x3(x),
                          self.branch3x3dbl_3(self.branch3x3dbl_2(
                              self.branch3x3dbl_1(x))),
                          F.max_pool2d(x, 3, 2)], 1)


class _InceptionC(nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = _BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b7, bd, bp], 1)


class _InceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)),
                          self.branch7x7x3_4(self.branch7x7x3_3(
                              self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                          F.max_pool2d(x, 3, 2)], 1)


class _InceptionE(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3,
                                           padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = _BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchSplittableInceptionV3(nn.Module):
    """Reference `SplittableInceptionV3` (`backbone.py:375-484`): the
    Mixed_5b..7c tail under `inception_modules.` + fc."""

    def __init__(self, bottleneck, num_classes=1000):
        super().__init__()
        self.bottleneck_layer = bottleneck
        mods = OrderedDict()
        mods['Mixed_5b'] = _InceptionA(192, 32)
        mods['Mixed_5c'] = _InceptionA(256, 64)
        mods['Mixed_5d'] = _InceptionA(288, 64)
        mods['Mixed_6a'] = _InceptionB(288)
        mods['Mixed_6b'] = _InceptionC(768, 128)
        mods['Mixed_6c'] = _InceptionC(768, 160)
        mods['Mixed_6d'] = _InceptionC(768, 160)
        mods['Mixed_6e'] = _InceptionC(768, 192)
        mods['Mixed_7a'] = _InceptionD(768)
        mods['Mixed_7b'] = _InceptionE(1280)
        mods['Mixed_7c'] = _InceptionE(2048)
        self.inception_modules = nn.Sequential(mods)
        self.fc = nn.Linear(2048, num_classes)

    def forward_tail(self, z):
        z = self.inception_modules(z)
        z = F.adaptive_avg_pool2d(z, (1, 1)).flatten(1)
        return self.fc(z)

    def forward(self, x):
        return self.forward_tail(self.bottleneck_layer(x))


# ---------------------------------------------------------------------------
# tf-EfficientNet (timm key space: conv_stem/bn1, blocks.s.b.*,
# conv_head/bn2, classifier; TF-SAME padding on stem + depthwise convs)
# ---------------------------------------------------------------------------

def _tf_same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    pad_h = max(k - s, 0) if ih % s == 0 else max(k - ih % s, 0)
    pad_w = max(k - s, 0) if iw % s == 0 else max(k - iw % s, 0)
    return F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                     pad_h // 2, pad_h - pad_h // 2))


class _Conv2dSame(nn.Conv2d):
    def forward(self, x):
        x = _tf_same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _SqueezeExcite(nn.Module):
    def __init__(self, mid, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(mid, rd, 1)
        self.conv_expand = nn.Conv2d(rd, mid, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.conv_expand(F.silu(self.conv_reduce(s))))
        return x * s


class _DsBlock(nn.Module):
    """timm DepthwiseSeparableConv (stage 0): conv_dw/bn1/se/conv_pw/bn2."""

    def __init__(self, in_ch, out_ch, k=3, s=1, se_ratio=0.25):
        super().__init__()
        self.conv_dw = _Conv2dSame(in_ch, in_ch, k, s, groups=in_ch,
                                   bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-3)
        self.se = _SqueezeExcite(in_ch, max(1, int(in_ch * se_ratio)))
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_skip = s == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_dw(x)))
        y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return x + y if self.has_skip else y


class _IrBlock(nn.Module):
    """timm InvertedResidual: conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3."""

    def __init__(self, in_ch, out_ch, expand, k=3, s=1, se_ratio=0.25):
        super().__init__()
        mid = in_ch * expand
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = _Conv2dSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.se = _SqueezeExcite(mid, max(1, int(in_ch * se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_skip = s == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_pw(x)))
        y = F.silu(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.has_skip else y


class TorchTFEfficientNet(nn.Module):
    """timm `tf_efficientnet_*` key space with the compound scaling of
    `models/efficientnet.py` (B0 stage table, width/depth coefficients)."""

    def __init__(self, width_coefficient=1.0, depth_coefficient=1.0,
                 num_classes=1000):
        super().__init__()
        from ..models.efficientnet import (_B0_STAGES, round_channels,
                                           round_repeats)
        stem = round_channels(32, width_coefficient)
        self.conv_stem = _Conv2dSame(3, stem, 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(stem, eps=1e-3)
        stages = []
        in_ch = stem
        for si, (expand, c, n, stride, k) in enumerate(_B0_STAGES):
            out_ch = round_channels(c, width_coefficient)
            blocks = []
            for bi in range(round_repeats(n, depth_coefficient)):
                s = stride if bi == 0 else 1
                if expand == 1:
                    blocks.append(_DsBlock(in_ch, out_ch, k, s))
                else:
                    blocks.append(_IrBlock(in_ch, out_ch, expand, k, s))
                in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        head = round_channels(1280, width_coefficient)
        self.conv_head = nn.Conv2d(in_ch, head, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(head, eps=1e-3)
        self.classifier = nn.Linear(head, num_classes)

    def forward(self, x):
        z = F.silu(self.bn1(self.conv_stem(x)))
        z = self.blocks(z)
        z = F.silu(self.bn2(self.conv_head(z)))
        z = F.adaptive_avg_pool2d(z, (1, 1)).flatten(1)
        return self.classifier(z)
