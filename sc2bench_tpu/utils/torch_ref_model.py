"""Reference-named full torch deploy pipeline for cross-framework parity.

Assembles the COMPLETE torch side of the reference's Entropic Student
deploy path — SplittableResNet tail + FPBasedResNetBottleneck encoder/
decoder + CompressAI-replica EntropyBottleneck + C++ rANS
(`/root/reference/sc2bench/models/backbone.py:225-254`,
`layer.py:444-550`) — with the reference's exact state-dict key space
(`bottleneck_layer.encoder.0.weight`, `layer2.0.conv1.weight`, ...), so
`utils/torch_convert.py` can map its weights into the flax model and
`tests/test_parity_full_model.py` can assert identical per-image bitstream
bytes, identical byte accounting, and matching logits end to end: the
offline stand-in for the reference's `-test_only` checkpoint-reproduction
protocol (`/root/reference/README.md:61-63,99-103`).

Torch-only on purpose (no jax imports): this is the *other* framework.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from .torch_golden import GoldenEntropyBottleneck

_PED = 2.0 ** -18  # CompressAI NonNegativeParametrizer pedestal


class TorchGDN1(nn.Module):
    """CompressAI GDN1 replica (abs-variant; params stored in sqrt space,
    NonNegativeParametrizer semantics — the reference uses
    `compressai.layers.GDN1` at `layer.py:478-494`)."""

    def __init__(self, ch, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(torch.sqrt(torch.ones(ch) + _PED))
        self.gamma = nn.Parameter(torch.sqrt(0.1 * torch.eye(ch) + _PED))

    @staticmethod
    def _reparam(stored, minimum):
        bound = (minimum + _PED) ** 0.5
        return torch.clamp(stored, min=bound) ** 2 - _PED

    def forward(self, x):
        ch = x.shape[1]
        beta = self._reparam(self.beta, 1e-6)
        gamma = self._reparam(self.gamma, 0.0).view(ch, ch, 1, 1)
        norm = nn.functional.conv2d(x.abs(), gamma, beta)
        return x * norm if self.inverse else x / norm


class TorchFPBottleneck(nn.Module):
    """FPBasedResNetBottleneck structure with the reference's Sequential
    key names (`layer.py:476-496`)."""

    def __init__(self, bch=24, target=256, in_ch=3):
        super().__init__()
        enc = [in_ch, bch * 4, bch * 2, bch]
        dec = [bch, target * 2, target, target]
        self.encoder = nn.Sequential(
            nn.Conv2d(enc[0], enc[1], 5, 2, 2, bias=False),
            TorchGDN1(enc[1]),
            nn.Conv2d(enc[1], enc[2], 5, 2, 2, bias=False),
            TorchGDN1(enc[2]),
            nn.Conv2d(enc[2], enc[3], 2, 1, 0, bias=False))
        self.decoder = nn.Sequential(
            nn.Conv2d(dec[0], dec[1], 2, 1, 1, bias=False),
            TorchGDN1(dec[1], inverse=True),
            nn.Conv2d(dec[1], dec[2], 2, 1, 0, bias=False),
            TorchGDN1(dec[2], inverse=True),
            nn.Conv2d(dec[2], dec[3], 2, 1, 1, bias=False))
        self.entropy_bottleneck = GoldenEntropyBottleneck(bch)


class TorchBottleneckBlock(nn.Module):
    """torchvision ResNet v1.5 bottleneck with the reference key names
    (conv1/bn1/.../downsample.0/1)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1):
        super().__init__()
        out = planes * self.expansion
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


def _stage(inplanes, planes, blocks, stride):
    layers = [TorchBottleneckBlock(inplanes, planes, stride)]
    layers += [TorchBottleneckBlock(planes * 4, planes)
               for _ in range(blocks - 1)]
    return nn.Sequential(*layers)


class TorchSplittableResNet(nn.Module):
    """Full reference student: bottleneck_layer + layer2-4 + fc
    (`backbone.py:190-276` structure, reference key space)."""

    def __init__(self, bch=24, target=256, stage_sizes=(3, 4, 6, 3),
                 num_classes=1000):
        super().__init__()
        self.bottleneck_layer = TorchFPBottleneck(bch, target)
        self.layer2 = _stage(target, 128, stage_sizes[1], 2)
        self.layer3 = _stage(512, 256, stage_sizes[2], 2)
        self.layer4 = _stage(1024, 512, stage_sizes[3], 2)
        self.fc = nn.Linear(2048, num_classes)

    def forward_tail(self, feat):
        z = self.layer4(self.layer3(self.layer2(feat)))
        z = z.mean(dim=(2, 3))
        return self.fc(z)


def randomize_for_parity(model: nn.Module, seed=0):
    """Non-degenerate weights + running stats (a fresh BatchNorm has
    mean 0 / var 1 — real checkpoints don't), and quantiles spread so the
    entropy tables have realistic support. Works on any of the torch
    replica families (the factorized bottleneck is found by module
    scan)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d, nn.Linear)):
                nn.init.normal_(m.weight, 0, 0.05, generator=g)
                if getattr(m, 'bias', None) is not None:
                    nn.init.normal_(m.bias, 0, 0.02, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3, generator=g)
                m.running_var.uniform_(0.7, 1.5, generator=g)
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
            elif isinstance(m, GoldenEntropyBottleneck):
                m.quantiles[:, 0, 0] -= 2.0
                m.quantiles[:, 0, 2] += 2.0
    model.eval()
    return model


@torch.no_grad()
def torch_deploy_forward(model: TorchSplittableResNet, coder, medians,
                         img_nchw: np.ndarray):
    """The reference eval hot loop (SURVEY.md §3.2) in torch at batch 1:
    encode → round(y − medians) → channel-major rANS → decode →
    + medians → decoder → tail. Returns (logits (1, K), bitstream bytes)."""
    med = torch.from_numpy(np.asarray(medians, np.float32)).view(
        1, -1, 1, 1)
    y = model.bottleneck_layer.encoder(torch.from_numpy(img_nchw))
    sym = torch.round(y - med).to(torch.int32).numpy()[0]
    c, h, w = sym.shape
    indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
    bits = coder.encode_with_indexes(sym.reshape(c, -1).ravel(), indexes)
    out = coder.decode_with_indexes(bits, indexes)
    y_hat = torch.from_numpy(
        out.reshape(1, c, h, w).astype(np.float32)) + med
    feat = model.bottleneck_layer.decoder(y_hat)
    return model.forward_tail(feat).numpy(), bits


class TorchSHPBottleneck(nn.Module):
    """SHPBasedResNetBottleneck structure with the reference's Sequential
    key names and geometry (`/root/reference/sc2bench/models/layer.py:592-
    629`): g_a/g_s conv+GDN stacks, h_a over |y|, h_s deconv stack, golden
    factorized EB for z and golden GaussianConditional for y."""

    def __init__(self, bch=24, target=256, lch=16, in_ch=3):
        super().__init__()
        from .torch_golden import (GoldenEntropyBottleneck,
                                   GoldenGaussianConditional)
        g_a = [in_ch, bch * 4, bch * 2, bch]
        g_s = [bch, target * 2, target, target]
        self.g_a = nn.Sequential(
            nn.Conv2d(g_a[0], g_a[1], 5, 2, 2, bias=False),
            TorchGDN1(g_a[1]),
            nn.Conv2d(g_a[1], g_a[2], 5, 2, 2, bias=False),
            TorchGDN1(g_a[2]),
            nn.Conv2d(g_a[2], g_a[3], 2, 1, 0, bias=False))
        self.g_s = nn.Sequential(
            nn.Conv2d(g_s[0], g_s[1], 2, 1, 1, bias=False),
            TorchGDN1(g_s[1], inverse=True),
            nn.Conv2d(g_s[1], g_s[2], 2, 1, 0, bias=False),
            TorchGDN1(g_s[2], inverse=True),
            nn.Conv2d(g_s[2], g_s[3], 2, 1, 1, bias=False))
        self.h_a = nn.Sequential(
            nn.Conv2d(bch, lch, 5, 2, 1, bias=False),
            nn.ReLU(),
            nn.Conv2d(lch, lch, 5, 2, 2, bias=False))
        self.h_s = nn.Sequential(
            nn.ConvTranspose2d(lch, lch, 5, 2, 1, bias=False),
            nn.LeakyReLU(),
            nn.ConvTranspose2d(lch, lch, 5, 2, 1, bias=False),
            nn.LeakyReLU(),
            nn.Conv2d(lch, bch, 5, 1, 0, bias=False))
        self.entropy_bottleneck = GoldenEntropyBottleneck(lch)
        self.gaussian_conditional = GoldenGaussianConditional()


class TorchSplittableSHPResNet(nn.Module):
    """Reference SHP student: SHP bottleneck + layer2-4 + fc (reference
    key space, `backbone.py:190-276` + `layer.py:553-720`)."""

    def __init__(self, bch=24, target=256, lch=16,
                 stage_sizes=(3, 4, 6, 3), num_classes=1000):
        super().__init__()
        self.bottleneck_layer = TorchSHPBottleneck(bch, target, lch)
        self.layer2 = _stage(target, 128, stage_sizes[1], 2)
        self.layer3 = _stage(512, 256, stage_sizes[2], 2)
        self.layer4 = _stage(1024, 512, stage_sizes[3], 2)
        self.fc = nn.Linear(2048, num_classes)

    def forward_tail(self, feat):
        z = self.layer4(self.layer3(self.layer2(feat)))
        z = z.mean(dim=(2, 3))
        return self.fc(z)


class TorchMSHPBottleneck(TorchSHPBottleneck):
    """MSHPBasedResNetBottleneck structure (reference `layer.py:745-767`):
    h_a sees y directly with LeakyReLU; h_s emits 2x bottleneck channels
    chunked into scales/means along the channel dim."""

    def __init__(self, bch=24, target=256, lch=16, in_ch=3):
        super().__init__(bch, target, lch, in_ch)
        self.h_a = nn.Sequential(
            nn.Conv2d(bch, lch, 5, 2, 1, bias=False),
            nn.LeakyReLU(),
            nn.Conv2d(lch, lch, 5, 2, 2, bias=False))
        self.h_s = nn.Sequential(
            nn.ConvTranspose2d(lch, lch, 5, 2, 1, bias=False),
            nn.LeakyReLU(),
            nn.ConvTranspose2d(lch, lch * 3 // 2, 5, 2, 1, bias=False),
            nn.LeakyReLU(),
            nn.Conv2d(lch * 3 // 2, bch * 2, 5, 1, 0, bias=False))


class TorchSplittableMSHPResNet(nn.Module):
    """Reference MSHP student: MSHP bottleneck + layer2-4 + fc."""

    def __init__(self, bch=24, target=256, lch=16,
                 stage_sizes=(3, 4, 6, 3), num_classes=1000):
        super().__init__()
        self.bottleneck_layer = TorchMSHPBottleneck(bch, target, lch)
        self.layer2 = _stage(target, 128, stage_sizes[1], 2)
        self.layer3 = _stage(512, 256, stage_sizes[2], 2)
        self.layer4 = _stage(1024, 512, stage_sizes[3], 2)
        self.fc = nn.Linear(2048, num_classes)

    def forward_tail(self, feat):
        z = self.layer4(self.layer3(self.layer2(feat)))
        z = z.mean(dim=(2, 3))
        return self.fc(z)


@torch.no_grad()
def torch_deploy_forward_shp(model, z_coder, y_coder, ggc, z_medians,
                             img_nchw: np.ndarray, mean_scale=False):
    """The reference SHP eval hot loop (`layer.py:640-665`) in torch at
    batch 1: y=g_a(x); z=h_a(|y|); z round-trips the factorized coder
    (channel-major, like the JAX runtime's `compress_symbols`); scales =
    h_s(z_hat) -> gaussian indexes; y round-trips the gaussian coder in
    NHWC ravel order (the JAX runtime's `compress_y` layout). Returns
    (logits (1, K), y bitstream bytes, z bitstream bytes)."""
    bl = model.bottleneck_layer
    zmed = torch.from_numpy(np.asarray(z_medians, np.float32)).view(
        1, -1, 1, 1)
    y = bl.g_a(torch.from_numpy(img_nchw))
    z = bl.h_a(y if mean_scale else torch.abs(y))
    z_sym = torch.round(z - zmed).to(torch.int32).numpy()[0]
    cz, hz, wz = z_sym.shape
    z_idx = np.repeat(np.arange(cz, dtype=np.int32), hz * wz)
    z_bits = z_coder.encode_with_indexes(
        z_sym.reshape(cz, -1).ravel(), z_idx)
    z_dec = z_coder.decode_with_indexes(z_bits, z_idx).reshape(cz, hz, wz)
    z_hat = torch.from_numpy(z_dec.astype(np.float32))[None] + zmed
    params = bl.h_s(z_hat)
    if mean_scale:
        scales, means = params.chunk(2, 1)          # channel split (NCHW)
    else:
        scales, means = params, None
    idx = ggc.build_indexes(scales)[0]               # (cy, hy, wy)
    y_sym = torch.round(y - means if means is not None else y)         .to(torch.int32).numpy()[0]
    cy, hy, wy = y_sym.shape
    y_sym_hwc = np.ascontiguousarray(
        np.transpose(y_sym, (1, 2, 0))).ravel()
    idx_hwc = np.ascontiguousarray(
        np.transpose(idx, (1, 2, 0))).ravel().astype(np.int32)
    y_bits = y_coder.encode_with_indexes(y_sym_hwc, idx_hwc)
    y_dec = y_coder.decode_with_indexes(y_bits, idx_hwc)
    y_hat = torch.from_numpy(np.transpose(
        y_dec.reshape(hy, wy, cy), (2, 0, 1)).astype(np.float32))[None]
    if means is not None:
        y_hat = y_hat + means
    feat = bl.g_s(y_hat)
    return model.forward_tail(feat).numpy(), y_bits, z_bits


class TorchMaskedConv2d(nn.Conv2d):
    """CompressAI 'A'-mask MaskedConv2d replica: output position (i, j)
    sees only strictly-previous raster positions (same state-dict leaves:
    weight/bias + a `mask` buffer)."""

    def __init__(self, in_ch, out_ch, kernel_size=5, stride=1, padding=2):
        super().__init__(in_ch, out_ch, kernel_size, stride, padding)
        k = self.kernel_size[0]
        mask = torch.ones(1, 1, k, k)
        mask[:, :, k // 2, k // 2:] = 0
        mask[:, :, k // 2 + 1:] = 0
        self.register_buffer('mask', mask)

    def forward(self, x):
        return nn.functional.conv2d(x, self.weight * self.mask, self.bias,
                                    self.stride, self.padding)


class TorchJointAutoregressiveCodec(nn.Module):
    """mbt2018 (joint autoregressive + hierarchical prior) replica with
    CompressAI's exact state-dict key space — the 4th neural codec family
    the reference resolves from the zoo
    (`/root/reference/sc2bench/models/registry.py:12-14`, config family
    `joint_autoregressive_hierarchical_prior`). Keys: g_a.0..6, g_s.0..6,
    h_a.0/2/4, h_s.0/2/4, context_prediction, entropy_parameters.0/2/4,
    entropy_bottleneck, matching compressai JointAutoregressive-
    HierarchicalPriors so released checkpoints convert with the same
    rules."""

    def __init__(self, n=192, m=192):
        super().__init__()
        from .torch_golden import GoldenGaussianConditional
        self.n, self.m = n, m
        self.g_a = nn.Sequential(
            nn.Conv2d(3, n, 5, 2, 2), TorchGDN1(n),
            nn.Conv2d(n, n, 5, 2, 2), TorchGDN1(n),
            nn.Conv2d(n, n, 5, 2, 2), TorchGDN1(n),
            nn.Conv2d(n, m, 5, 2, 2))
        self.g_s = nn.Sequential(
            nn.ConvTranspose2d(m, n, 5, 2, 2, output_padding=1),
            TorchGDN1(n, inverse=True),
            nn.ConvTranspose2d(n, n, 5, 2, 2, output_padding=1),
            TorchGDN1(n, inverse=True),
            nn.ConvTranspose2d(n, n, 5, 2, 2, output_padding=1),
            TorchGDN1(n, inverse=True),
            nn.ConvTranspose2d(n, 3, 5, 2, 2, output_padding=1))
        self.h_a = nn.Sequential(
            nn.Conv2d(m, n, 3, 1, 1), nn.LeakyReLU(),
            nn.Conv2d(n, n, 5, 2, 2), nn.LeakyReLU(),
            nn.Conv2d(n, n, 5, 2, 2))
        self.h_s = nn.Sequential(
            nn.ConvTranspose2d(n, m, 5, 2, 2, output_padding=1),
            nn.LeakyReLU(),
            nn.ConvTranspose2d(m, m * 3 // 2, 5, 2, 2, output_padding=1),
            nn.LeakyReLU(),
            nn.Conv2d(m * 3 // 2, m * 2, 3, 1, 1))
        self.context_prediction = TorchMaskedConv2d(m, 2 * m)
        self.entropy_parameters = nn.Sequential(
            nn.Conv2d(m * 12 // 3, m * 10 // 3, 1), nn.LeakyReLU(),
            nn.Conv2d(m * 10 // 3, m * 8 // 3, 1), nn.LeakyReLU(),
            nn.Conv2d(m * 8 // 3, m * 6 // 3, 1))
        self.entropy_bottleneck = GoldenEntropyBottleneck(n)
        self.gaussian_conditional = GoldenGaussianConditional()


@torch.no_grad()
def torch_deploy_forward_jahp(model: TorchJointAutoregressiveCodec,
                              z_coder, z_medians, img_nchw: np.ndarray):
    """The mbt2018 deploy path as CompressAI runs it — a SERIAL per-pixel
    raster scan (compressai `_compress_ar` semantics: per position,
    masked-conv context over already-quantized neighbors + hyper params
    -> entropy_parameters -> Gaussian scales/means; symbol =
    round(y - mean)). This is the oracle the JAX runtime's
    wavefront-PARALLEL schedule must agree with symbol-for-symbol.

    Returns (x_hat NCHW, sym_grid (h, w, m) int32, idx_grid (h, w, m)
    int32, y_hat (h, w, m) float32, z_bits)."""
    zmed = torch.from_numpy(np.asarray(z_medians, np.float32)).view(
        1, -1, 1, 1)
    y = model.g_a(torch.from_numpy(img_nchw))
    z = model.h_a(y)
    z_sym = torch.round(z - zmed).to(torch.int32).numpy()[0]
    cz, hz, wz = z_sym.shape
    z_idx = np.repeat(np.arange(cz, dtype=np.int32), hz * wz)
    z_bits = z_coder.encode_with_indexes(
        z_sym.reshape(cz, -1).ravel(), z_idx)
    z_dec = z_coder.decode_with_indexes(z_bits, z_idx).reshape(cz, hz, wz)
    z_hat = torch.from_numpy(z_dec.astype(np.float32))[None] + zmed
    hyper = model.h_s(z_hat)
    ggc = model.gaussian_conditional
    m = model.m
    k = model.context_prediction.kernel_size[0]
    k2 = k // 2
    _, _, h, w = y.shape
    y_hat = torch.zeros(1, m, h + 2 * k2, w + 2 * k2)
    sym_grid = np.zeros((h, w, m), np.int32)
    idx_grid = np.zeros((h, w, m), np.int32)
    wm = model.context_prediction.weight * model.context_prediction.mask
    for i in range(h):
        for j in range(w):
            patch = y_hat[:, :, i:i + k, j:j + k]
            ctx = nn.functional.conv2d(patch, wm,
                                       model.context_prediction.bias)
            feat = torch.cat([hyper[:, :, i:i + 1, j:j + 1], ctx], dim=1)
            params = model.entropy_parameters(feat)
            scales, means = params.chunk(2, 1)
            mu = means[0, :, 0, 0]
            sym = torch.round(y[0, :, i, j] - mu)
            y_hat[0, :, i + k2, j + k2] = sym + mu
            sym_grid[i, j] = sym.to(torch.int32).numpy()
            idx_grid[i, j] = np.asarray(
                ggc.build_indexes(scales)).reshape(-1)
    y_final = y_hat[:, :, k2:k2 + h, k2:k2 + w]
    x_hat = model.g_s(y_final)
    return (x_hat.numpy(), sym_grid, idx_grid,
            y_final.numpy()[0].transpose(1, 2, 0), z_bits)


class TorchSplittableFasterRCNN(nn.Module):
    """Faster R-CNN + FPN over the splittable backbone with the reference's
    exact state-dict key space (torchvision>=0.15.1 as `create_faster_rcnn_fpn`
    composes it, `/root/reference/sc2bench/models/detection/rcnn.py:113-166`):
    backbone.body.{bottleneck_layer,layer2..4}, backbone.fpn.inner_blocks/
    layer_blocks.{i}.0, rpn.head.conv.0.0/cls_logits/bbox_pred,
    roi_heads.box_head.fc6/fc7, roi_heads.box_predictor.cls_score/bbox_pred.
    BatchNorm in eval mode is numerically FrozenBatchNorm2d (same eps)."""

    def __init__(self, bch=24, target=256, stage_sizes=(3, 4, 6, 3),
                 num_classes=91, num_anchors=3, out_channels=256):
        super().__init__()

        class _Body(nn.Module):
            def __init__(self):
                super().__init__()
                self.bottleneck_layer = TorchFPBottleneck(bch, target)
                self.layer2 = _stage(target, 128, stage_sizes[1], 2)
                self.layer3 = _stage(512, 256, stage_sizes[2], 2)
                self.layer4 = _stage(1024, 512, stage_sizes[3], 2)

        class _FPN(nn.Module):
            def __init__(self):
                super().__init__()
                ch = [target, 512, 1024, 2048]
                # torchvision Conv2dNormActivation without norm: index .0
                self.inner_blocks = nn.ModuleList(
                    [nn.Sequential(nn.Conv2d(c, out_channels, 1))
                     for c in ch])
                self.layer_blocks = nn.ModuleList(
                    [nn.Sequential(nn.Conv2d(out_channels, out_channels,
                                             3, 1, 1))
                     for _ in ch])

        class _Backbone(nn.Module):
            def __init__(self):
                super().__init__()
                self.body = _Body()
                self.fpn = _FPN()

        class _RPNHead(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Sequential(nn.Sequential(
                    nn.Conv2d(out_channels, out_channels, 3, 1, 1)))
                self.cls_logits = nn.Conv2d(out_channels, num_anchors, 1)
                self.bbox_pred = nn.Conv2d(out_channels, num_anchors * 4, 1)

        class _RPN(nn.Module):
            def __init__(self):
                super().__init__()
                self.head = _RPNHead()

        class _BoxHead(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc6 = nn.Linear(out_channels * 7 * 7, 1024)
                self.fc7 = nn.Linear(1024, 1024)

        class _BoxPredictor(nn.Module):
            def __init__(self):
                super().__init__()
                self.cls_score = nn.Linear(1024, num_classes)
                self.bbox_pred = nn.Linear(1024, num_classes * 4)

        class _RoIHeads(nn.Module):
            def __init__(self):
                super().__init__()
                self.box_head = _BoxHead()
                self.box_predictor = _BoxPredictor()

        self.backbone = _Backbone()
        self.rpn = _RPN()
        self.roi_heads = _RoIHeads()


@torch.no_grad()
def torch_detection_stage_forward(model: TorchSplittableFasterRCNN,
                                  medians, img_nchw: np.ndarray):
    """Stage-wise torch forward for cross-framework detection parity
    (deploy dequantize path): bottleneck round-trip -> C2..C5 ->
    FPN P2..P6 (nearest top-down upsample + LastLevelMaxPool, torchvision
    semantics) -> RPN head maps per level. Returns
    (bottleneck symbols int32 NCHW, [C2..C5], [P2..P6],
    [per-level (cls, reg)]) as numpy NCHW arrays."""
    body = model.backbone.body
    med = torch.from_numpy(np.asarray(medians, np.float32)).view(
        1, -1, 1, 1)
    y = body.bottleneck_layer.encoder(torch.from_numpy(img_nchw))
    sym = torch.round(y - med)
    c2 = body.bottleneck_layer.decoder(sym + med)
    c3 = body.layer2(c2)
    c4 = body.layer3(c3)
    c5 = body.layer4(c4)
    cs = [c2, c3, c4, c5]
    fpn = model.backbone.fpn
    laterals = [blk(c) for blk, c in zip(fpn.inner_blocks, cs)]
    for i in range(len(laterals) - 2, -1, -1):
        laterals[i] = laterals[i] + nn.functional.interpolate(
            laterals[i + 1], size=laterals[i].shape[-2:], mode='nearest')
    ps = [blk(l) for blk, l in zip(fpn.layer_blocks, laterals)]
    ps.append(nn.functional.max_pool2d(ps[-1], 1, 2))
    head = model.rpn.head
    rpn_out = []
    for p in ps:
        t = torch.relu(head.conv(p))
        rpn_out.append((head.cls_logits(t).numpy(),
                        head.bbox_pred(t).numpy()))
    return (sym.to(torch.int32).numpy(), [c.numpy() for c in cs],
            [p.numpy() for p in ps], rpn_out)


@torch.no_grad()
def torch_box_head_forward(model: TorchSplittableFasterRCNN,
                           pooled_nchw: np.ndarray):
    """Box head + predictor on a fixed pooled tensor (N, 256, 7, 7) —
    isolates the MLP head (the NCHW flatten order fc6 expects)."""
    rh = model.roi_heads
    x = torch.from_numpy(pooled_nchw).flatten(1)
    x = torch.relu(rh.box_head.fc6(x))
    x = torch.relu(rh.box_head.fc7(x))
    return (rh.box_predictor.cls_score(x).numpy(),
            rh.box_predictor.bbox_pred(x).numpy())


def _dilated_stage(inplanes, planes, blocks, prev_dilation, new_dilation):
    """torchvision `_make_layer` with `replace_stride_with_dilation`:
    stride-1 blocks, first block at the incoming dilation, the rest at the
    doubled one (DeepLabv3 backbone semantics)."""
    layers = [TorchBottleneckBlock(inplanes, planes, 1, prev_dilation)]
    layers += [TorchBottleneckBlock(planes * 4, planes, 1, new_dilation)
               for _ in range(blocks - 1)]
    return nn.Sequential(*layers)


class _TorchASPP(nn.Module):
    """torchvision ASPP key space: convs.0 (1x1), convs.1..3 (dilated 3x3),
    convs.4 (pooling branch: pool at .0, conv at .1, bn at .2), project."""

    def __init__(self, in_ch=2048, out=256, rates=(12, 24, 36)):
        super().__init__()
        convs = [nn.Sequential(nn.Conv2d(in_ch, out, 1, bias=False),
                               nn.BatchNorm2d(out), nn.ReLU())]
        for r in rates:
            convs.append(nn.Sequential(
                nn.Conv2d(in_ch, out, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(out), nn.ReLU()))
        convs.append(nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(in_ch, out, 1, bias=False),
            nn.BatchNorm2d(out), nn.ReLU()))
        self.convs = nn.ModuleList(convs)
        self.project = nn.Sequential(
            nn.Conv2d(len(convs) * out, out, 1, bias=False),
            nn.BatchNorm2d(out), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        size = x.shape[-2:]
        res = [c(x) for c in self.convs[:-1]]
        pooled = self.convs[-1](x)
        res.append(nn.functional.interpolate(
            pooled, size=size, mode='bilinear', align_corners=False))
        return self.project(torch.cat(res, dim=1))


class TorchSplittableDeepLabV3(nn.Module):
    """DeepLabv3 over the splittable backbone with the reference's exact
    key space (`/root/reference/sc2bench/models/segmentation/base.py:42-65`
    stores FeatureExtractionBackbone children under `backbone.<name>`;
    heads are torchvision DeepLabHead/FCNHead Sequentials:
    classifier.0 (ASPP) .1 (conv) .2 (bn) .4 (final), aux_classifier
    .0/.1/.4). layer3/4 are dilated (stride replaced), stride-8 'out'."""

    def __init__(self, bch=24, target=256, stage_sizes=(3, 4, 6, 3),
                 num_classes=21):
        super().__init__()

        class _Backbone(nn.Module):
            def __init__(self):
                super().__init__()
                self.bottleneck_layer = TorchFPBottleneck(bch, target)
                self.layer2 = _stage(target, 128, stage_sizes[1], 2)
                self.layer3 = _dilated_stage(512, 256, stage_sizes[2], 1, 2)
                self.layer4 = _dilated_stage(1024, 512, stage_sizes[3],
                                             2, 4)

        self.backbone = _Backbone()
        self.classifier = nn.Sequential(
            _TorchASPP(2048, 256),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, num_classes, 1))
        self.aux_classifier = nn.Sequential(
            nn.Conv2d(1024, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(), nn.Dropout(0.1),
            nn.Conv2d(256, num_classes, 1))


@torch.no_grad()
def torch_segmentation_forward(model: TorchSplittableDeepLabV3, medians,
                               img_nchw: np.ndarray):
    """Deploy dequantize path: bottleneck round-trip -> dilated stages ->
    DeepLab head -> bilinear upsample to input (align_corners=False,
    reference `segmentation/base.py:66-82`). Returns (out, aux) NCHW."""
    body = model.backbone
    med = torch.from_numpy(np.asarray(medians, np.float32)).view(
        1, -1, 1, 1)
    x = torch.from_numpy(img_nchw)
    y = body.bottleneck_layer.encoder(x)
    c2 = body.bottleneck_layer.decoder(torch.round(y - med) + med)
    c3 = body.layer2(c2)
    aux_feat = body.layer3(c3)
    out_feat = body.layer4(aux_feat)
    size = x.shape[-2:]
    out = nn.functional.interpolate(
        model.classifier(out_feat), size=size, mode='bilinear',
        align_corners=False)
    aux = nn.functional.interpolate(
        model.aux_classifier(aux_feat), size=size, mode='bilinear',
        align_corners=False)
    return out.numpy(), aux.numpy()


class TorchSplittableMaskRCNN(TorchSplittableFasterRCNN):
    """+ torchvision>=0.15 mask head key space: roi_heads.mask_head.{i}.0
    (Conv2dNormActivation) and roi_heads.mask_predictor.conv5_mask /
    mask_fcn_logits."""

    def __init__(self, num_classes=91, **kwargs):
        super().__init__(num_classes=num_classes, **kwargs)
        self.roi_heads.mask_head = nn.Sequential(*[
            nn.Sequential(nn.Conv2d(256, 256, 3, padding=1), nn.ReLU())
            for _ in range(4)])

        class _MaskPredictor(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv5_mask = nn.ConvTranspose2d(256, 256, 2, 2)
                self.mask_fcn_logits = nn.Conv2d(256, num_classes, 1)

        self.roi_heads.mask_predictor = _MaskPredictor()


class TorchSplittableKeypointRCNN(TorchSplittableFasterRCNN):
    """+ torchvision keypoint head key space: roi_heads.keypoint_head
    (flat Sequential, convs at even indices) and
    roi_heads.keypoint_predictor.kps_score_lowres."""

    def __init__(self, num_keypoints=17, **kwargs):
        super().__init__(**kwargs)
        layers = []
        for i in range(8):
            layers += [nn.Conv2d(256 if i == 0 else 512, 512, 3,
                                 padding=1), nn.ReLU()]
        self.roi_heads.keypoint_head = nn.Sequential(*layers)

        class _KpPredictor(nn.Module):
            def __init__(self):
                super().__init__()
                self.kps_score_lowres = nn.ConvTranspose2d(
                    512, num_keypoints, 4, 2, 1)

        self.roi_heads.keypoint_predictor = _KpPredictor()


@torch.no_grad()
def torch_mask_head_forward(model: TorchSplittableMaskRCNN,
                            pooled_nchw: np.ndarray):
    """(N, 256, 14, 14) pooled -> (N, K, 28, 28) mask logits."""
    rh = model.roi_heads
    x = rh.mask_head(torch.from_numpy(pooled_nchw))
    x = torch.relu(rh.mask_predictor.conv5_mask(x))
    return rh.mask_predictor.mask_fcn_logits(x).numpy()


@torch.no_grad()
def torch_keypoint_head_forward(model: TorchSplittableKeypointRCNN,
                                pooled_nchw: np.ndarray):
    """(N, 256, 14, 14) pooled -> (N, K, 56, 56) heatmaps (deconv + 2x
    bilinear upsample, align_corners=False — torchvision predictor)."""
    rh = model.roi_heads
    x = rh.keypoint_head(torch.from_numpy(pooled_nchw))
    x = rh.keypoint_predictor.kps_score_lowres(x)
    return nn.functional.interpolate(
        x, scale_factor=2, mode='bilinear', align_corners=False,
        recompute_scale_factor=False).numpy()


# ---------------------------------------------------------------------------
# CompressAI-zoo image codecs (input-compression baselines). The reference
# resolves these from compressai.zoo (`/root/reference/sc2bench/models/
# registry.py:12-80`: bmshj2018_factorized, bmshj2018_hyperprior,
# mbt2018_mean); these replicas reproduce the zoo key space + geometry so
# `torch_convert.ZOO_*_RULES` can be pinned by a full-codec parity oracle.
# ---------------------------------------------------------------------------

def _zoo_g_a(n, m):
    return nn.Sequential(
        nn.Conv2d(3, n, 5, 2, 2), TorchGDN1(n),
        nn.Conv2d(n, n, 5, 2, 2), TorchGDN1(n),
        nn.Conv2d(n, n, 5, 2, 2), TorchGDN1(n),
        nn.Conv2d(n, m, 5, 2, 2))


def _zoo_g_s(n, m):
    return nn.Sequential(
        nn.ConvTranspose2d(m, n, 5, 2, 2, 1), TorchGDN1(n, inverse=True),
        nn.ConvTranspose2d(n, n, 5, 2, 2, 1), TorchGDN1(n, inverse=True),
        nn.ConvTranspose2d(n, n, 5, 2, 2, 1), TorchGDN1(n, inverse=True),
        nn.ConvTranspose2d(n, 3, 5, 2, 2, 1))


class TorchZooFactorizedPrior(nn.Module):
    """bmshj2018_factorized replica (CompressAI FactorizedPrior key
    space): 4-stage conv+GDN analysis/synthesis, factorized prior on y."""

    def __init__(self, n=8, m=12):
        super().__init__()
        from .torch_golden import GoldenEntropyBottleneck
        self.g_a = _zoo_g_a(n, m)
        self.g_s = _zoo_g_s(n, m)
        self.entropy_bottleneck = GoldenEntropyBottleneck(m)


class TorchZooScaleHyperprior(nn.Module):
    """bmshj2018_hyperprior replica: h_a over |y|, ReLU-terminated h_s
    emitting scales only."""

    mean_scale = False

    def __init__(self, n=8, m=12):
        super().__init__()
        from .torch_golden import (GoldenEntropyBottleneck,
                                   GoldenGaussianConditional)
        self.g_a = _zoo_g_a(n, m)
        self.g_s = _zoo_g_s(n, m)
        self.h_a = nn.Sequential(
            nn.Conv2d(m, n, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(n, n, 5, 2, 2), nn.ReLU(),
            nn.Conv2d(n, n, 5, 2, 2))
        self.h_s = nn.Sequential(
            nn.ConvTranspose2d(n, n, 5, 2, 2, 1), nn.ReLU(),
            nn.ConvTranspose2d(n, n, 5, 2, 2, 1), nn.ReLU(),
            nn.Conv2d(n, m, 3, 1, 1), nn.ReLU())
        self.entropy_bottleneck = GoldenEntropyBottleneck(n)
        self.gaussian_conditional = GoldenGaussianConditional()


class TorchZooMeanScaleHyperprior(TorchZooScaleHyperprior):
    """mbt2018_mean replica: LeakyReLU hyper-nets over y directly; h_s
    emits 2M channels chunked into (scales, means)."""

    mean_scale = True

    def __init__(self, n=8, m=12):
        super().__init__(n, m)
        self.h_a = nn.Sequential(
            nn.Conv2d(m, n, 3, 1, 1), nn.LeakyReLU(),
            nn.Conv2d(n, n, 5, 2, 2), nn.LeakyReLU(),
            nn.Conv2d(n, n, 5, 2, 2))
        self.h_s = nn.Sequential(
            nn.ConvTranspose2d(n, m, 5, 2, 2, 1), nn.LeakyReLU(),
            nn.ConvTranspose2d(m, m * 3 // 2, 5, 2, 2, 1), nn.LeakyReLU(),
            nn.Conv2d(m * 3 // 2, m * 2, 3, 1, 1))


@torch.no_grad()
def torch_deploy_forward_zoo_fp(model, coder, medians,
                                img_nchw: np.ndarray):
    """CompressAI FactorizedPrior compress→decompress (reference wrapper
    call sites `sc2bench/models/wrapper.py:126-129`): channel-major
    factorized coding of round(y − medians), matching the JAX
    `ImageCodecRuntime`/`FactorizedCodec.compress_symbols` layout.
    Returns (x_hat (1, 3, H, W), bitstream bytes)."""
    med = torch.from_numpy(np.asarray(medians, np.float32)).view(
        1, -1, 1, 1)
    y = model.g_a(torch.from_numpy(img_nchw))
    sym = torch.round(y - med).to(torch.int32).numpy()[0]
    c, h, w = sym.shape
    indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
    bits = coder.encode_with_indexes(sym.reshape(c, -1).ravel(), indexes)
    out = coder.decode_with_indexes(bits, indexes)
    y_hat = torch.from_numpy(
        out.reshape(1, c, h, w).astype(np.float32)) + med
    return model.g_s(y_hat).numpy(), bits


@torch.no_grad()
def torch_deploy_forward_zoo_hyper(model, z_coder, y_coder, z_medians,
                                   img_nchw: np.ndarray):
    """CompressAI (Mean)ScaleHyperprior compress→decompress. Layouts
    match the JAX `ImageCodecRuntime`: z channel-major through the
    factorized coder, y NHWC-ravel through the gaussian coder. Returns
    (x_hat (1, 3, H, W), y bitstream, z bitstream)."""
    mean_scale = model.mean_scale
    zmed = torch.from_numpy(np.asarray(z_medians, np.float32)).view(
        1, -1, 1, 1)
    y = model.g_a(torch.from_numpy(img_nchw))
    z = model.h_a(y if mean_scale else torch.abs(y))
    z_sym = torch.round(z - zmed).to(torch.int32).numpy()[0]
    cz, hz, wz = z_sym.shape
    z_idx = np.repeat(np.arange(cz, dtype=np.int32), hz * wz)
    z_bits = z_coder.encode_with_indexes(
        z_sym.reshape(cz, -1).ravel(), z_idx)
    z_dec = z_coder.decode_with_indexes(z_bits, z_idx).reshape(cz, hz, wz)
    z_hat = torch.from_numpy(z_dec.astype(np.float32))[None] + zmed
    params = model.h_s(z_hat)
    if mean_scale:
        scales, means = params.chunk(2, 1)
    else:
        scales, means = params, None
    idx = model.gaussian_conditional.build_indexes(scales)[0]
    y_sym = torch.round(y - means if means is not None else y)         .to(torch.int32).numpy()[0]
    cy, hy, wy = y_sym.shape
    y_sym_hwc = np.ascontiguousarray(
        np.transpose(y_sym, (1, 2, 0))).ravel()
    idx_hwc = np.ascontiguousarray(
        np.transpose(idx, (1, 2, 0))).ravel().astype(np.int32)
    y_bits = y_coder.encode_with_indexes(y_sym_hwc, idx_hwc)
    y_dec = y_coder.decode_with_indexes(y_bits, idx_hwc)
    y_hat = torch.from_numpy(np.transpose(
        y_dec.reshape(hy, wy, cy), (2, 0, 1)).astype(np.float32))[None]
    if means is not None:
        y_hat = y_hat + means
    return model.g_s(y_hat).numpy(), y_bits, z_bits


# ---------------------------------------------------------------------------
# Full detection deploy oracle: torchvision EVAL semantics in numpy/torch
# (RegionProposalNetwork.filter_proposals + MultiScaleRoIAlign aligned=False
# + RoIHeads.postprocess_detections), composed over the torch replica's
# learned tensors. Pins the reference's entire `-test_only` detection path
# (`/root/reference/sc2bench/models/backbone.py:130-144` +
# `detection/base.py:98-101` + torchvision GeneralizedRCNN eval) against
# the JAX SplitDetectionRuntime end to end — bitstream bytes and
# postprocessed boxes/scores/labels.
# ---------------------------------------------------------------------------

_NP_BBOX_CLIP = float(np.log(1000.0 / 16))


def _np_cell_anchors(level_sizes, aspect_ratios):
    """torchvision AnchorGenerator.generate_anchors: ratio-major order,
    aspect_ratio = h / w, rounded base anchors."""
    cell = []
    for ar in aspect_ratios:
        hr = np.sqrt(ar)
        wr = 1.0 / hr
        for size in level_sizes:
            ws, hs = wr * size, hr * size
            cell.append([-ws / 2, -hs / 2, ws / 2, hs / 2])
    return np.round(np.asarray(cell, np.float32))


def _np_anchors(feature_shapes, image_hw, sizes, aspect_ratios):
    ih, iw = image_hw
    out = []
    for (fh, fw), level_sizes in zip(feature_shapes, sizes):
        sh, sw = ih // fh, iw // fw
        cell = _np_cell_anchors(level_sizes, aspect_ratios)
        sx, sy = np.meshgrid(np.arange(fw, dtype=np.float32) * sw,
                             np.arange(fh, dtype=np.float32) * sh)
        shifts = np.stack([sx.ravel(), sy.ravel(),
                           sx.ravel(), sy.ravel()], axis=1)
        out.append((shifts[:, None, :] + cell[None, :, :])
                   .reshape(-1, 4).astype(np.float32))
    return out


def _np_decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    px = (boxes[..., 0] + boxes[..., 2]) / 2
    py = (boxes[..., 1] + boxes[..., 3]) / 2
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, _NP_BBOX_CLIP)
    dh = np.minimum(deltas[..., 3] / wh, _NP_BBOX_CLIP)
    cx, cy = dx * pw + px, dy * ph + py
    w, h = np.exp(dw) * pw, np.exp(dh) * ph
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    axis=-1)


def _np_clip_boxes(boxes, image_hw):
    h, w = image_hw
    return np.stack([boxes[..., 0].clip(0, w), boxes[..., 1].clip(0, h),
                     boxes[..., 2].clip(0, w), boxes[..., 3].clip(0, h)],
                    axis=-1)


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])  # noqa: E731
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def _np_nms(boxes, scores, thresh):
    """Greedy NMS, score-descending, first-index tie-break (torchvision
    `nms`). Returns kept indices in selection order."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iou = _np_iou(boxes[i:i + 1], boxes[rest])[0]
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


def _np_batched_nms(boxes, scores, idxs, thresh):
    if boxes.size == 0:
        return np.zeros((0,), np.int64)
    offs = idxs.astype(np.float32) * (boxes.max() + 1.0)
    return _np_nms(boxes + offs[:, None], scores, thresh)


def _np_roi_align(feature_hwc, boxes, out, scale, sampling_ratio=2):
    """torchvision roi_align, aligned=False: raw continuous coordinates in
    index space, roi size floored at 1, samples outside [-1, size] zeroed."""
    h, w, _ = feature_hwc.shape
    s = sampling_ratio
    b = boxes * scale
    x1, y1 = b[:, 0], b[:, 1]
    rw = np.maximum(b[:, 2] - x1, 1.0)
    rh = np.maximum(b[:, 3] - y1, 1.0)

    def grid(start, size):
        return (start[:, None, None]
                + np.arange(out)[None, :, None] * (size / out)[:, None, None]
                + (np.arange(s)[None, None, :] + 0.5)
                * (size / out)[:, None, None] / s)

    ys = grid(y1, rh)
    xs = grid(x1, rw)
    yy = np.broadcast_to(ys[:, :, None, :, None],
                         (len(b), out, out, s, s))
    xx = np.broadcast_to(xs[:, None, :, None, :],
                         (len(b), out, out, s, s))
    valid = (yy >= -1) & (yy <= h) & (xx >= -1) & (xx <= w)
    y0, x0 = np.floor(yy), np.floor(xx)
    wy1, wx1 = yy - y0, xx - x0
    wy0, wx0 = 1 - wy1, 1 - wx1

    def g(a, b_):
        yi = np.clip(a.astype(np.int64), 0, h - 1)
        xi = np.clip(b_.astype(np.int64), 0, w - 1)
        return feature_hwc[yi, xi]

    val = (g(y0, x0) * (wy0 * wx0)[..., None]
           + g(y0, x0 + 1) * (wy0 * wx1)[..., None]
           + g(y0 + 1, x0) * (wy1 * wx0)[..., None]
           + g(y0 + 1, x0 + 1) * (wy1 * wx1)[..., None])
    return (val * valid[..., None]).mean(axis=(3, 4))


def _np_multiscale_roi_align(features_hwc, boxes, out, scales,
                             sampling_ratio=2):
    """FPN LevelMapper (k = floor(4 + log2(sqrt(area)/224 + 1e-6))) +
    per-level roi_align."""
    areas = (np.clip(boxes[:, 2] - boxes[:, 0], 0, None)
             * np.clip(boxes[:, 3] - boxes[:, 1], 0, None))
    k = np.floor(4 + np.log2(np.sqrt(areas) / 224 + 1e-6))
    k = np.clip(k, 2, 2 + len(features_hwc) - 1).astype(np.int64) - 2
    pooled = np.zeros((len(boxes), out, out, features_hwc[0].shape[-1]),
                      np.float32)
    for lvl, feat in enumerate(features_hwc):
        sel = k == lvl
        if sel.any():
            pooled[sel] = _np_roi_align(feat, boxes[sel], out,
                                        scales[lvl], sampling_ratio)
    return pooled


@torch.no_grad()
def torch_deploy_forward_detection(
        model: TorchSplittableFasterRCNN, coder, medians,
        img_nchw: np.ndarray,
        anchor_sizes=((32,), (64,), (128,), (256,), (512,)),
        aspect_ratios=(0.5, 1.0, 2.0),
        rpn_pre_nms=1000, rpn_post_nms=1000, rpn_nms_thresh=0.7,
        score_thresh=0.05, nms_thresh=0.5, detections_per_img=100):
    """Reference `-test_only` detection deploy at batch 1: bottleneck
    encode → channel-major rANS bitstream → decode → C2..C5 → FPN →
    torchvision-eval RPN filter_proposals → MultiScaleRoIAlign → box
    head → postprocess_detections. Returns (boxes (D, 4), scores (D,),
    labels (D,), bitstream bytes), D = valid detections, score-sorted."""
    body = model.backbone.body
    med = torch.from_numpy(np.asarray(medians, np.float32)).view(
        1, -1, 1, 1)
    y = body.bottleneck_layer.encoder(torch.from_numpy(img_nchw))
    sym = torch.round(y - med).to(torch.int32).numpy()[0]
    c, h, w = sym.shape
    indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
    bits = coder.encode_with_indexes(sym.reshape(c, -1).ravel(), indexes)
    dec = coder.decode_with_indexes(bits, indexes).reshape(1, c, h, w)
    c2 = body.bottleneck_layer.decoder(
        torch.from_numpy(dec.astype(np.float32)) + med)
    c3 = body.layer2(c2)
    c4 = body.layer3(c3)
    c5 = body.layer4(c4)
    fpn = model.backbone.fpn
    laterals = [blk(cf) for blk, cf in zip(fpn.inner_blocks,
                                           [c2, c3, c4, c5])]
    for i in range(len(laterals) - 2, -1, -1):
        laterals[i] = laterals[i] + nn.functional.interpolate(
            laterals[i + 1], size=laterals[i].shape[-2:], mode='nearest')
    ps = [blk(lat) for blk, lat in zip(fpn.layer_blocks, laterals)]
    ps.append(nn.functional.max_pool2d(ps[-1], 1, 2))
    head = model.rpn.head
    image_hw = img_nchw.shape[2:]
    num_a = len(aspect_ratios)

    obj_l, del_l = [], []
    for p in ps:
        t = torch.relu(head.conv(p))
        cls = head.cls_logits(t).numpy()[0]          # (A, H, W)
        reg = head.bbox_pred(t).numpy()[0]           # (A*4, H, W)
        ah, aw = cls.shape[1:]
        obj_l.append(np.transpose(cls, (1, 2, 0)).ravel())     # (H*W*A,)
        del_l.append(reg.reshape(num_a, 4, ah, aw)
                     .transpose(2, 3, 0, 1).reshape(-1, 4))
    anchors_l = _np_anchors([p.shape[-2:] for p in ps], image_hw,
                            anchor_sizes, aspect_ratios)

    # --- RPN filter_proposals (eval mode) -------------------------------
    cand_boxes, cand_scores, cand_levels = [], [], []
    for lvl, (obj, dl, an) in enumerate(zip(obj_l, del_l, anchors_l)):
        k = min(rpn_pre_nms, obj.shape[0])
        top = np.argsort(-obj, kind='stable')[:k]
        boxes = _np_clip_boxes(_np_decode_boxes(dl[top], an[top]),
                               image_hw)
        scores = 1.0 / (1.0 + np.exp(-obj[top]))
        small = ((boxes[:, 2] - boxes[:, 0]) >= 1e-3) \
            & ((boxes[:, 3] - boxes[:, 1]) >= 1e-3)
        cand_boxes.append(boxes[small])
        cand_scores.append(scores[small])
        cand_levels.append(np.full(int(small.sum()), lvl, np.int64))
    boxes = np.concatenate(cand_boxes)
    scores = np.concatenate(cand_scores)
    levels = np.concatenate(cand_levels)
    keep = _np_batched_nms(boxes, scores, levels, rpn_nms_thresh)
    proposals = boxes[keep[:rpn_post_nms]]

    # --- box head over MultiScaleRoIAlign (P2..P5) ----------------------
    feats_hwc = [np.transpose(p.numpy()[0], (1, 2, 0)) for p in ps[:4]]
    scales = [f.shape[0] / image_hw[0] for f in feats_hwc]
    pooled = _np_multiscale_roi_align(feats_hwc, proposals, 7, scales)
    t_scores, t_deltas = torch_box_head_forward(
        model, np.transpose(pooled, (0, 3, 1, 2)).copy())
    cls_scores = torch.softmax(torch.from_numpy(t_scores), dim=-1).numpy()
    num_classes = cls_scores.shape[-1]
    deltas = t_deltas.reshape(-1, num_classes, 4)

    # --- RoIHeads.postprocess_detections --------------------------------
    dboxes = _np_clip_boxes(
        _np_decode_boxes(deltas, proposals[:, None, :],
                         weights=(10.0, 10.0, 5.0, 5.0)), image_hw)
    fg_boxes = dboxes[:, 1:, :].reshape(-1, 4)
    fg_scores = cls_scores[:, 1:].reshape(-1)
    fg_labels = np.tile(np.arange(1, num_classes, dtype=np.int64),
                        len(proposals))
    ok = (fg_scores > score_thresh) \
        & ((fg_boxes[:, 2] - fg_boxes[:, 0]) >= 1e-2) \
        & ((fg_boxes[:, 3] - fg_boxes[:, 1]) >= 1e-2)
    fg_boxes, fg_scores, fg_labels = \
        fg_boxes[ok], fg_scores[ok], fg_labels[ok]
    keep = _np_batched_nms(fg_boxes, fg_scores, fg_labels, nms_thresh)
    keep = keep[:detections_per_img]
    return fg_boxes[keep], fg_scores[keep], fg_labels[keep], bits
