"""Splittable hybrid ViT (ResNetV2 stem ViT with a compression bottleneck).

Faithful native implementation of the timm `vit_small_r26_s32_224` the
reference prunes (`/root/reference/sc2bench/models/backbone.py:565-655,
857-891`: `SplittableHybridViT` removes the patch-embed ResNet's first
`num_pruned_stages` stages, feeds the bottleneck output through the
remaining stages, then the transformer with cls token + learned position
embedding). Architecture per timm's R26+S/32 recipe (Steiner et al.,
"How to train your ViT?"): ResNetV2-26 backbone — weight-standardized
'SAME'-padded convs (eps 1e-8), GroupNorm(32), non-pre-activation
bottleneck blocks, stage widths 256/512/1024/2048 — then a 1x1 patch
projection to ViT-S (dim 384, 12 blocks, 6 heads, exact-GELU MLP).
Patch grid 7x7 at 224 input (total stride 32). NHWC throughout; the
attention/matmul stack is pure MXU work."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import register_model
from .layer import get_layer


class StdConv(nn.Module):
    """Weight-standardized conv with TF-style 'SAME' padding — timm's
    `StdConv2dSame` (the ResNetV2/BiT conv; standardization happens at
    call time over (kh, kw, in) per output channel, biased variance,
    eps 1e-8)."""

    features: int
    kernel_size: tuple
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + 1e-8)
        return jax.lax.conv_general_dilated(
            x, w, (self.strides, self.strides), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _gn(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)


class ResNetV2Block(nn.Module):
    """timm ResNetV2 non-preact bottleneck: StdConv 1x1 -> GN+relu ->
    StdConv 3x3 (stride) -> GN+relu -> StdConv 1x1 -> GN -> relu(+short);
    1x1 StdConv + GN downsample."""

    out_ch: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        shortcut = x
        if self.strides > 1 or x.shape[-1] != self.out_ch:
            shortcut = StdConv(self.out_ch, (1, 1), self.strides,
                               name='downsample_conv')(x)
            shortcut = _gn('downsample_norm')(shortcut)
        y = nn.relu(_gn('norm1')(StdConv(mid, (1, 1), name='conv1')(x)))
        y = nn.relu(_gn('norm2')(StdConv(mid, (3, 3), self.strides,
                                         name='conv2')(y)))
        y = _gn('norm3')(StdConv(self.out_ch, (1, 1), name='conv3')(y))
        return nn.relu(y + shortcut)


class ResNetV2Stage(nn.Module):
    out_ch: int
    blocks: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = ResNetV2Block(self.out_ch,
                              self.strides if i == 0 else 1,
                              name=f'block{i}')(x)
        return x


class ViTBlock(nn.Module):
    """timm ViT block: pre-LN attention (fused qkv) + pre-LN exact-GELU
    MLP, both residual."""

    dim: int = 384
    num_heads: int = 6
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        hd = self.dim // self.num_heads
        y = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        qkv = nn.Dense(3 * self.dim, name='qkv')(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = nn.softmax(jnp.einsum('bhqd,bhkd->bhqk', q, k)
                          * (hd ** -0.5), axis=-1)
        y = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(self.dim, name='attn_proj')(y)
        y = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name='mlp_fc2')(y)
        return x + y


class _ViTTail(nn.Module):
    """Shared transformer tail: 1x1 patch projection -> cls+pos ->
    blocks -> norm -> head."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 1000
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(self.embed_dim, (1, 1), name='patch_proj')(z)
        n, h, w, c = z.shape
        tokens = z.reshape(n, h * w, c)
        cls = self.param('cls_token',
                         nn.initializers.zeros, (1, 1, self.embed_dim))
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, h * w + 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)), tokens], axis=1)
        tokens = tokens + pos
        for i in range(self.depth):
            tokens = ViTBlock(self.embed_dim, self.num_heads,
                              name=f'block{i}')(tokens)
            if self.sow_intermediates and i == self.depth - 1:
                self.sow('intermediates', f'block{i}_out', tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name='norm')(tokens)
        return nn.Dense(self.num_classes, name='head')(tokens[:, 0])


# ResNetV2-26 widths/depths (timm `_resnetv2((2, 2, 2, 2))`)
_R26_WIDTHS = (256, 512, 1024, 2048)
_R26_DEPTHS = (2, 2, 2, 2)


class SplittableHybridViT(nn.Module):
    """bottleneck (-> 56x56x256, replacing stem+stage0) -> ResNetV2
    stages 1-3 (-> 7x7x2048) -> ViT-S -> cls head. Flax scopes keep the
    ORIGINAL timm stage indices (stage1..stage3), matching the reference
    student key space (`patch_embed_pruned_stages.1..3` — torch Sequential
    slices preserve child names)."""

    bottleneck_layer: nn.Module
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 1000
    num_pruned_stages: int = 1
    sow_intermediates: bool = True

    def setup(self):
        if self.num_pruned_stages != 1:
            raise NotImplementedError(
                'reference configs use num_pruned_stages=1')
        self.stage1 = ResNetV2Stage(_R26_WIDTHS[1], _R26_DEPTHS[1],
                                    strides=2)
        self.stage2 = ResNetV2Stage(_R26_WIDTHS[2], _R26_DEPTHS[2],
                                    strides=2)
        self.stage3 = ResNetV2Stage(_R26_WIDTHS[3], _R26_DEPTHS[3],
                                    strides=2)
        self.vit = _ViTTail(self.embed_dim, self.depth, self.num_heads,
                            self.num_classes, self.sow_intermediates)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        return self.forward_tail(z, sow=self.sow_intermediates)

    def forward_tail(self, feature, train: bool = False, sow: bool = False):
        z = feature
        for i, stage in ((1, self.stage1), (2, self.stage2),
                         (3, self.stage3)):
            z = stage(z)
            if sow:
                self.sow('intermediates', f'stage{i}_out', z)
        return self.vit(z)


class HybridViT(nn.Module):
    """Full (unsplit) hybrid ViT — the reference's timm
    `vit_small_r26_s32_224` teacher anchor: ResNetV2-26 backbone (StdConv
    'SAME', GroupNorm32, non-preact bottlenecks) + ViT-S. Sows
    stage{0..3}_out so distillation hints can target the stage the
    student's bottleneck replaces (reference hook
    `patch_embed.backbone.stages.0`)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 1000
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        z = StdConv(64, (7, 7), 2, name='stem_conv')(x)
        z = nn.relu(_gn('stem_norm')(z))
        z = nn.max_pool(z, (3, 3), (2, 2), padding='SAME')
        for i, (w, d) in enumerate(zip(_R26_WIDTHS, _R26_DEPTHS)):
            z = ResNetV2Stage(w, d, strides=1 if i == 0 else 2,
                              name=f'stage{i}')(z)
            if self.sow_intermediates:
                self.sow('intermediates', f'stage{i}_out', z)
        return _ViTTail(self.embed_dim, self.depth, self.num_heads,
                        self.num_classes, self.sow_intermediates,
                        name='vit')(z)


@register_model
def hybrid_vit_small_r26_s32_224(num_classes=1000, **kwargs):
    """Teacher builder matching the reference's timm
    `vit_small_r26_s32_224` anchor."""
    return HybridViT(num_classes=num_classes)


@register_model
def splittable_hybrid_vit(bottleneck_config, num_classes=1000,
                          num_pruned_stages=1, **kwargs):
    """Builder (reference `backbone.py:857-891`)."""
    bottleneck = get_layer(bottleneck_config['key'],
                           **bottleneck_config.get('kwargs', {}))
    return SplittableHybridViT(bottleneck_layer=bottleneck,
                               num_classes=num_classes,
                               num_pruned_stages=num_pruned_stages)
