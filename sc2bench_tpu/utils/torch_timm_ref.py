"""Timm-key-space torch replicas for cross-framework parity.

The reference builds its ResNeSt / RegNetY / hybrid-ViT splittable
variants on timm models (`/root/reference/sc2bench/models/backbone.py:
487-655,786-891`, `registry.py:108-139`), so its released checkpoints use
the *timm* state-dict key spaces. timm is not installable in this
environment; these modules reimplement the exact architectures AND key
spaces from the published papers/semantics (ResNeSt split attention,
RegNet design space, ResNetV2+ViT hybrid) so that
`utils/torch_convert.py`'s RESNEST/REGNET/HYBRID_VIT rules can be pinned
by stage-parity tests (`tests/test_parity_timm_families.py`) — the same
offline oracle strategy `torch_ref_model.py` uses for the torchvision
families. Test fixtures reimplemented from the algorithms, not lifted
code. Torch-only on purpose (no jax imports)."""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---- ResNeSt (timm `resnest50d`) --------------------------------------
class TorchSplAtConv2d(nn.Module):
    """timm `SplAtConv2d` semantics + key space (conv, bn0, fc1, bn1,
    fc2): radix-split 3x3 grouped conv with learned per-split attention."""

    def __init__(self, in_ch, ch, radix=2, groups=1, stride=1,
                 reduction_factor=4):
        super().__init__()
        self.radix = radix
        attn = max(in_ch * radix // reduction_factor, 32)
        self.conv = nn.Conv2d(in_ch, ch * radix, 3, stride, 1,
                              groups=groups * radix, bias=False)
        self.bn0 = nn.BatchNorm2d(ch * radix)
        self.fc1 = nn.Conv2d(ch, attn, 1, groups=groups)
        self.bn1 = nn.BatchNorm2d(attn)
        self.fc2 = nn.Conv2d(attn, ch * radix, 1, groups=groups)

    def forward(self, x):
        x = F.relu(self.bn0(self.conv(x)))
        b, rc, h, w = x.shape
        r, c = self.radix, rc // self.radix
        splits = x.reshape(b, r, c, h, w)
        gap = splits.sum(dim=1).mean((2, 3), keepdim=True)
        a = F.relu(self.bn1(self.fc1(gap)))
        a = self.fc2(a).reshape(b, r, c)
        attn = torch.softmax(a, dim=1) if r > 1 else torch.sigmoid(a)
        return (splits * attn[:, :, :, None, None]).sum(dim=1)


class TorchResNestBottleneck(nn.Module):
    """timm `ResNestBottleneck` (avd=True, avd_first=False, avg_down):
    conv1/bn1 -> SplAt conv2 -> avd pool (stride-2 blocks) -> conv3/bn3,
    avg-down shortcut Sequential(pool, conv, bn)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = TorchSplAtConv2d(planes, planes)
        self.avd_last = nn.AvgPool2d(3, stride, padding=1) \
            if stride > 1 else None
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if stride > 1 or inplanes != planes * 4:
            pool = nn.AvgPool2d(2, stride, ceil_mode=True,
                                count_include_pad=False) \
                if stride > 1 else nn.Identity()
            self.downsample = nn.Sequential(
                pool, nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        if self.avd_last is not None:
            y = self.avd_last(y)
        y = self.bn3(self.conv3(y))
        return F.relu(y + shortcut)


def _resnest_stage(inplanes, planes, blocks, stride):
    layers = [TorchResNestBottleneck(inplanes, planes, stride)]
    layers += [TorchResNestBottleneck(planes * 4, planes)
               for _ in range(blocks - 1)]
    return nn.Sequential(*layers)


class TorchResNeSt(nn.Module):
    """timm `resnest50d` key space: deep stem `conv1.{0,1,3,4,6}` + `bn1`,
    layers 1-4 of ResNestBottleneck, `fc`."""

    def __init__(self, stage_sizes=(3, 4, 6, 3), num_classes=1000):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 64, 3, 1, 1, bias=False))
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = _resnest_stage(64, 64, stage_sizes[0], 1)
        self.layer2 = _resnest_stage(256, 128, stage_sizes[1], 2)
        self.layer3 = _resnest_stage(512, 256, stage_sizes[2], 2)
        self.layer4 = _resnest_stage(1024, 512, stage_sizes[3], 2)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean(dim=(2, 3)))

    def forward_tail(self, feat):
        """Splittable-student tail (bottleneck output -> logits), the
        reference SplittableResNet.forward after the bottleneck
        (`backbone.py:225-254` with a timm resnest base)."""
        z = self.layer4(self.layer3(self.layer2(feat)))
        return self.fc(z.mean(dim=(2, 3)))


# ---- RegNetY (timm `regnety_064`) -------------------------------------
class _ConvBn(nn.Module):
    """timm `ConvNormAct` key space (.conv/.bn)."""

    def __init__(self, in_ch, out_ch, k=1, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, k // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class _SE(nn.Module):
    """timm `SEModule` key space (fc1/fc2, 1x1 convs with bias)."""

    def __init__(self, ch, rd_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd_ch, 1)
        self.fc2 = nn.Conv2d(rd_ch, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(F.relu(self.fc1(s))))


class TorchRegNetBottleneck(nn.Module):
    """timm RegNet `Bottleneck`: conv1 -> grouped conv2 -> SE -> conv3
    (no act) -> relu(x + shortcut); downsample .conv/.bn."""

    def __init__(self, in_ch, width, stride, group_width, se_ratio=0.25):
        super().__init__()
        self.conv1 = _ConvBn(in_ch, width)
        self.conv2 = _ConvBn(width, width, 3, stride,
                             groups=max(1, width // group_width))
        self.se = _SE(width, int(round(in_ch * se_ratio)))
        self.conv3 = _ConvBn(width, width, act=False)
        if stride > 1 or in_ch != width:
            self.downsample = nn.Module()
            self.downsample.conv = nn.Conv2d(in_ch, width, 1, stride,
                                             bias=False)
            self.downsample.bn = nn.BatchNorm2d(width)
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample.bn(self.downsample.conv(x))
        y = self.conv3(self.se(self.conv2(self.conv1(x))))
        return F.relu(y + shortcut)


class _RegNetStage(nn.Module):
    """timm stage: blocks named b1..bN (1-indexed)."""

    def __init__(self, in_ch, width, depth, group_width):
        super().__init__()
        for i in range(depth):
            self.add_module(
                f'b{i + 1}',
                TorchRegNetBottleneck(in_ch if i == 0 else width, width,
                                      2 if i == 0 else 1, group_width))

    def forward(self, x):
        for m in self.children():
            x = m(x)
        return x


class TorchRegNetY(nn.Module):
    """timm `regnety_064` key space: stem.conv/.bn, s1..s4 (b1-indexed
    blocks), head.fc."""

    def __init__(self, stage_widths=(144, 288, 576, 1296),
                 stage_depths=(2, 7, 14, 2), group_width=72,
                 num_classes=1000):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.stem.bn = nn.BatchNorm2d(32)
        in_ch = 32
        for i, (w, d) in enumerate(zip(stage_widths, stage_depths),
                                   start=1):
            self.add_module(f's{i}', _RegNetStage(in_ch, w, d, group_width))
            in_ch = w
        self.head = nn.Module()
        self.head.fc = nn.Linear(in_ch, num_classes)

    def forward(self, x):
        x = F.relu(self.stem.bn(self.stem.conv(x)))
        for i in range(1, 5):
            x = getattr(self, f's{i}')(x)
        return self.head.fc(x.mean(dim=(2, 3)))

    def forward_tail(self, feat):
        """Splittable tail: s2-s4 + head (reference SplittableRegNet
        forward, `backbone.py:523-541`)."""
        z = self.s4(self.s3(self.s2(feat)))
        return self.head.fc(z.mean(dim=(2, 3)))


# ---- Hybrid ViT (timm `vit_small_r26_s32_224`) -------------------------
def _pad_same(x, k, s):
    """TF-style 'SAME' asymmetric padding (extra on right/bottom)."""
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class TorchStdConvSame(nn.Conv2d):
    """timm `StdConv2dSame`: weight-standardized (biased var, eps 1e-8)
    conv with TF-'SAME' padding, no bias."""

    def __init__(self, in_ch, out_ch, k, stride=1):
        super().__init__(in_ch, out_ch, k, stride, padding=0, bias=False)

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, None, self.stride)


class TorchResNetV2Block(nn.Module):
    """timm ResNetV2 non-preact bottleneck (GroupNorm32 + StdConvSame),
    key space conv1/norm1..conv3/norm3 + downsample.conv/.norm."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        mid = out_ch // 4
        self.conv1 = TorchStdConvSame(in_ch, mid, 1)
        self.norm1 = nn.GroupNorm(32, mid)
        self.conv2 = TorchStdConvSame(mid, mid, 3, stride)
        self.norm2 = nn.GroupNorm(32, mid)
        self.conv3 = TorchStdConvSame(mid, out_ch, 1)
        self.norm3 = nn.GroupNorm(32, out_ch)
        if stride > 1 or in_ch != out_ch:
            self.downsample = nn.Module()
            self.downsample.conv = TorchStdConvSame(in_ch, out_ch, 1,
                                                    stride)
            self.downsample.norm = nn.GroupNorm(32, out_ch)
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample.norm(self.downsample.conv(x))
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        y = self.norm3(self.conv3(y))
        return F.relu(y + shortcut)


class _V2Stage(nn.Module):
    """key space blocks.{j}."""

    def __init__(self, in_ch, out_ch, depth, stride):
        super().__init__()
        self.blocks = nn.Sequential(*[
            TorchResNetV2Block(in_ch if i == 0 else out_ch, out_ch,
                               stride if i == 0 else 1)
            for i in range(depth)])

    def forward(self, x):
        return self.blocks(x)


class TorchViTBlock(nn.Module):
    """timm ViT block key space (norm1, attn.qkv/.proj, norm2,
    mlp.fc1/.fc2); exact GELU."""

    def __init__(self, dim=384, heads=6):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.attn.qkv(self.norm1(x))
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(b, n, self.heads, hd).transpose(1, 2)
        k = k.reshape(b, n, self.heads, hd).transpose(1, 2)
        v = v.reshape(b, n, self.heads, hd).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, dim=-1)
        y = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


_V2_WIDTHS = (256, 512, 1024, 2048)


class TorchHybridViT(nn.Module):
    """timm `vit_small_r26_s32_224` key space: patch_embed.backbone
    (ResNetV2-26: stem.conv/.norm + stages.{0..3}.blocks.{j}),
    patch_embed.proj (1x1), cls_token/pos_embed, blocks.{i}, norm, head."""

    def __init__(self, dim=384, depth=12, heads=6, num_classes=1000,
                 num_tokens=50):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.backbone = nn.Module()
        bb = self.patch_embed.backbone
        bb.stem = nn.Module()
        bb.stem.conv = TorchStdConvSame(3, 64, 7, 2)
        bb.stem.norm = nn.GroupNorm(32, 64)
        bb.stages = nn.Sequential(*[
            _V2Stage(64 if i == 0 else _V2_WIDTHS[i - 1], w, 2,
                     1 if i == 0 else 2)
            for i, w in enumerate(_V2_WIDTHS)])
        self.patch_embed.proj = nn.Conv2d(_V2_WIDTHS[-1], dim, 1)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, num_tokens, dim))
        self.blocks = nn.Sequential(*[TorchViTBlock(dim, heads)
                                      for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def _tokens(self, z):
        z = self.patch_embed.proj(z).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(z.shape[0], -1, -1)
        z = torch.cat([cls, z], dim=1) + self.pos_embed
        return self.head(self.norm(self.blocks(z))[:, 0])

    def forward(self, x):
        bb = self.patch_embed.backbone
        z = bb.stem.norm(bb.stem.conv(x)).relu()
        z = F.max_pool2d(_pad_same(z, 3, 2), 3, 2)
        z = bb.stages(z)
        return self._tokens(z)

    def forward_tail(self, feat):
        """Splittable-student tail: stages 1-3 + ViT (the reference
        SplittableHybridViT.forward after the bottleneck,
        `backbone.py:628-646`)."""
        z = self.patch_embed.backbone.stages[1:](feat)
        return self._tokens(z)

    def splittable_state_dict(self):
        """Teacher keys -> the reference student key space
        (stages kept at ORIGINAL indices by torch Sequential slicing)."""
        out = {}
        for k, v in self.state_dict().items():
            if k.startswith('patch_embed.backbone.stages.0') \
                    or k.startswith('patch_embed.backbone.stem'):
                continue
            k = k.replace('patch_embed.backbone.stages.',
                          'patch_embed_pruned_stages.')
            k = k.replace('patch_embed.proj', 'patch_embed_proj')
            out[k] = v
        return out
