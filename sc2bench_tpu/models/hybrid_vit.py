"""Splittable hybrid ViT (ResNet-stem ViT with a compression bottleneck).

Native equivalent of the timm `vit_small_r26_s32_224` variant the reference
prunes (`/root/reference/sc2bench/models/backbone.py:565-655,857-891`:
`SplittableHybridViT` removes the patch-embed ResNet's early stages, feeds
the bottleneck output through the remaining stages, then the transformer
with cls token + learned position embedding). Transformer: ViT-S (dim 384,
12 blocks, 6 heads); patch grid 7x7 at 224 input (total stride 32).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..registry import register_model
from .layer import get_layer
from .resnet import ResNetStage


class TransformerBlock(nn.Module):
    dim: int = 384
    num_heads: int = 6
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(name='norm1')(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            deterministic=True, name='attn')(y, y)
        x = x + y
        y = nn.LayerNorm(name='norm2')(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1')(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name='mlp_fc2')(y)
        return x + y


class SplittableHybridViT(nn.Module):
    """bottleneck (→56x56x256) → ResNet stages 2-3 (→14x14) → stride-2 proj
    (7x7 tokens) → ViT-S blocks → cls head."""

    bottleneck_layer: nn.Module
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 1000
    num_tokens: int = 49  # 7x7 grid at 224 input
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.bottleneck_layer(x, mode=mode, train=train)
        if self.sow_intermediates:
            self.sow('intermediates', 'bottleneck_layer_out', z)
        # remaining conv stages of the hybrid embed (R26-ish)
        z = ResNetStage(128, 2, strides=2, name='stage2')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'stage2_out', z)
        z = ResNetStage(256, 2, strides=2, name='stage3')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'stage3_out', z)
        # patch projection with stride 2 → total stride 32
        z = nn.Conv(self.embed_dim, (1, 1), (2, 2), name='patch_proj')(z)
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
            tokens = TransformerBlock(self.embed_dim, self.num_heads,
                                      name=f'block{i}')(tokens, train)
            if self.sow_intermediates and i == self.depth - 1:
                self.sow('intermediates', f'block{i}_out', tokens)
        tokens = nn.LayerNorm(name='norm')(tokens)
        return nn.Dense(self.num_classes, name='head')(tokens[:, 0])


class HybridViT(nn.Module):
    """Full (unsplit) hybrid ViT — the teacher anchor the reference takes
    from timm (`vit_small_r26_s32_224`). R26 conv stem (stage1..3) + patch
    projection + ViT-S blocks. Sows stage outputs so distillation hints can
    target the layer the student's bottleneck replaces
    (reference hint: `patch_embed.backbone.stages.0`)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 1000
    sow_intermediates: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        z = nn.Conv(64, (7, 7), (2, 2), ((3, 3), (3, 3)), use_bias=False,
                    name='stem_conv')(x)
        z = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='stem_bn')(
            z, use_running_average=not train)
        z = nn.relu(z)
        z = nn.max_pool(z, (3, 3), (2, 2), ((1, 1), (1, 1)))
        z = ResNetStage(64, 2, strides=1, name='stage1')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'stage1_out', z)
        z = ResNetStage(128, 2, strides=2, name='stage2')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'stage2_out', z)
        z = ResNetStage(256, 2, strides=2, name='stage3')(z, train)
        if self.sow_intermediates:
            self.sow('intermediates', 'stage3_out', z)
        z = nn.Conv(self.embed_dim, (1, 1), (2, 2), name='patch_proj')(z)
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
            tokens = TransformerBlock(self.embed_dim, self.num_heads,
                                      name=f'block{i}')(tokens, train)
            if self.sow_intermediates and i == self.depth - 1:
                self.sow('intermediates', f'block{i}_out', tokens)
        tokens = nn.LayerNorm(name='norm')(tokens)
        return nn.Dense(self.num_classes, name='head')(tokens[:, 0])


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
                               num_classes=num_classes)
