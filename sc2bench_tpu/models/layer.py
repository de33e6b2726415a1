"""Split-point bottleneck layers (TPU-native).

Re-design of `/root/reference/sc2bench/models/layer.py` as Flax modules over
NHWC tensors. The reference's mutable tri-state forward
(`layer.py:535-550`: train-with-noise / STE-finetune-after-update /
deploy-with-real-bitstream) becomes an explicit `mode` argument over pure
functions; `update()` becomes a pure table build (`ops/entropy/tables.py`)
and the deploy bitstream path runs through `encode_ops`/`decode_ops` methods
that produce/consume integer symbol tensors for the host rANS coder.

Modes:
  'train'     — noise quantization, sows ('entropy_bottleneck', (y_hat, lik))
  'finetune'  — dequantize-with-medians + stop_gradient (post-update)
  deploy      — use encode_ops/decode_ops + RansCoder (see models/runtime.py)
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.entropy.factorized import EntropyBottleneck
from ..ops.entropy.gaussian import GaussianConditional
from ..ops.gdn import GDN1
from ..registry import register_layer

LayerSpec = Tuple[Any, ...]


class LayerSeq(nn.Module):
    """Sequential stack described by a tiny spec language so encoder/decoder
    splits at an arbitrary index reproduce the reference's builder functions
    (`layer.py:108-343`). Specs:
      ('conv', out_ch, kernel, stride, padding)        # bias-free
      ('deconv', out_ch, kernel, stride)               # transpose, bias-free
      ('bn',), ('relu',), ('maxpool', k, s, p), ('avgpool', k, s)
    """

    specs: Sequence[LayerSpec]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, spec in enumerate(self.specs):
            kind = spec[0]
            if kind == 'conv':
                _, out_ch, k, s, p = spec
                x = nn.Conv(out_ch, (k, k), strides=(s, s),
                            padding=((p, p), (p, p)), use_bias=False,
                            name=f'layer{i}')(x)
            elif kind == 'deconv':
                _, out_ch, k, s = spec
                x = nn.ConvTranspose(out_ch, (k, k), strides=(s, s),
                                     padding='SAME', use_bias=False,
                                     name=f'layer{i}')(x)
            elif kind == 'bn':
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f'layer{i}')(x)
            elif kind == 'relu':
                x = nn.relu(x)
            elif kind == 'maxpool':
                _, k, s, p = spec
                x = nn.max_pool(x, (k, k), strides=(s, s),
                                padding=((p, p), (p, p)))
            elif kind == 'avgpool':
                _, k, s = spec
                x = nn.avg_pool(x, (k, k), strides=(s, s))
            else:
                raise ValueError(f'unknown spec {spec}')
        return x


@register_layer
class SimpleBottleneck(nn.Module):
    """Encoder→(compressor→decompressor)→decoder with no entropy model —
    the CR+BQ family's bottleneck (reference `layer.py:41-105`). Compressor /
    decompressor are host-side transform names resolved by the runtime
    (e.g. SimpleQuantizer FP16/INT8); inside jit the forward is just
    encoder→decoder.
    """

    encoder_specs: Sequence[LayerSpec]
    decoder_specs: Sequence[LayerSpec]
    compressor: Optional[dict] = None
    decompressor: Optional[dict] = None

    def setup(self):
        self.encoder = LayerSeq(self.encoder_specs)
        self.decoder = LayerSeq(self.decoder_specs)

    def encode_latent(self, x, train: bool = False):
        return self.encoder(x, train)

    def decode_latent(self, z, train: bool = False):
        return self.decoder(z, train)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self.encoder(x, train)
        self.sow('intermediates', 'bottleneck_out', z)
        return self.decoder(z, train)


def _stem_specs():
    """conv7s2 + BN + ReLU + maxpool3s2 front shared by the CR+BQ encoders."""
    return [('conv', 64, 7, 2, 3), ('bn',), ('relu',), ('maxpool', 3, 2, 1),
            ('bn',), ('relu',)]


@register_layer
def larger_resnet_bottleneck(bottleneck_channel=12, bottleneck_idx=7,
                             output_channel=256, compressor=None,
                             decompressor=None, **kwargs):
    """GHND bottleneck for ResNet-50/101/152 (reference `layer.py:108-153`,
    with the ghnd-bq configs' `output_channel` kwarg): encoder ends at module
    index `bottleneck_idx`; the decoder upsamples the stride-8 latent back to
    a layer1-compatible feature (`output_channel` @ stride 4) so the GHND
    hint `bottleneck_layer_out <-> teacher layer1_out` is well-posed and the
    tail's layer2 sees its expected input."""
    specs = _stem_specs() + [
        ('conv', bottleneck_channel, 2, 2, 0), ('bn',), ('relu',),
        ('conv', 512, 2, 1, 1), ('bn',), ('relu',),
        ('conv', 512, 2, 1, 0), ('bn',), ('relu',),
        ('deconv', 256, 2, 2), ('bn',), ('relu',),
        ('conv', output_channel, 2, 1, 1), ('bn',), ('relu',),
        ('conv', output_channel, 2, 1, 0),
    ]
    return SimpleBottleneck(specs[:bottleneck_idx], specs[bottleneck_idx:],
                            compressor, decompressor)


@register_layer
def larger_densenet_bottleneck(bottleneck_channel=12, bottleneck_idx=8,
                               compressor=None, decompressor=None, **kwargs):
    """GHND bottleneck for DenseNet-169/201 (reference `layer.py:156-204`)."""
    specs = _stem_specs() + [
        ('conv', bottleneck_channel, 2, 2, 1), ('bn',), ('relu',),
        ('conv', 512, 2, 1, 1), ('bn',), ('relu',),
        ('conv', 512, 2, 1, 1), ('bn',), ('relu',),
        ('conv', 256, 2, 1, 0), ('bn',), ('relu',),
        ('conv', 256, 2, 1, 0), ('bn',), ('relu',),
        ('conv', 256, 2, 1, 0), ('avgpool', 2, 2),
    ]
    return SimpleBottleneck(specs[:bottleneck_idx], specs[bottleneck_idx:],
                            compressor, decompressor)


@register_layer
def inception_v3_bottleneck(bottleneck_channel=12, bottleneck_idx=7,
                            compressor=None, decompressor=None, **kwargs):
    """GHND bottleneck for InceptionV3 (reference `layer.py:207-247`)."""
    specs = [
        ('conv', 64, 7, 2, 0), ('bn',), ('relu',), ('maxpool', 3, 2, 0),
        ('bn',), ('relu',),
        ('conv', bottleneck_channel, 2, 2, 1), ('bn',), ('relu',),
        ('conv', 256, 2, 1, 1), ('bn',), ('relu',),
        ('conv', 256, 2, 1, 0), ('bn',), ('relu',),
        ('conv', 192, 2, 1, 0), ('avgpool', 2, 1),
    ]
    return SimpleBottleneck(specs[:bottleneck_idx], specs[bottleneck_idx:],
                            compressor, decompressor)


def _layer1_specs(bottleneck_channel, head_channels):
    """Shared shape of the layer1-replacement bottlenecks
    (reference `layer.py:250-343`); `head_channels` distinguishes the
    smaller (ResNet-18/34) and larger (ResNet-50+) variants."""
    c1, c2, c3, c4 = head_channels
    return [
        ('conv', 64, 2, 1, 1), ('bn',),
        ('conv', 256, 2, 1, 1), ('bn',), ('relu',),
        ('conv', 64, 2, 1, 1), ('bn',),
        ('conv', bottleneck_channel, 2, 1, 1), ('bn',), ('relu',),
        ('conv', c1, 2, 1, 0), ('bn',),
        ('conv', c2, 2, 1, 0), ('bn',), ('relu',),
        ('conv', c3, 2, 1, 0), ('bn',),
        ('conv', c4, 2, 1, 0), ('bn',), ('relu',),
    ]


@register_layer
def smaller_resnet_layer1_bottleneck(bottleneck_channel=12, bottleneck_idx=8,
                                     compressor=None, decompressor=None,
                                     **kwargs):
    specs = _layer1_specs(bottleneck_channel, (64, 128, 64, 64))
    return SimpleBottleneck(specs[:bottleneck_idx], specs[bottleneck_idx:],
                            compressor, decompressor)


@register_layer
def larger_resnet_layer1_bottleneck(bottleneck_channel=12, bottleneck_idx=8,
                                    compressor=None, decompressor=None,
                                    **kwargs):
    specs = _layer1_specs(bottleneck_channel, (64, 128, 256, 256))
    return SimpleBottleneck(specs[:bottleneck_idx], specs[bottleneck_idx:],
                            compressor, decompressor)


@register_layer
class EntropyBottleneckLayer(nn.Module):
    """Bare factorized-prior bottleneck as a standalone layer
    (reference `layer.py:346-398`), used by the fine-tuning family
    (EntropicClassifier split points)."""

    channels: int

    def setup(self):
        self.entropy_bottleneck = EntropyBottleneck(channels=self.channels)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        eb_mode = 'noise' if mode == 'train' else 'dequantize'
        y_hat, likelihoods = self.entropy_bottleneck(x, mode=eb_mode)
        self.sow('entropy', 'eb_out', (y_hat, likelihoods))
        if mode == 'finetune':
            y_hat = jax.lax.stop_gradient(y_hat)
        return y_hat

    def encode_ops(self, x, medians):
        symbols = jnp.round(x - medians).astype(jnp.int32)
        return {'symbols': symbols}

    def decode_ops(self, symbols, medians):
        return symbols.astype(jnp.float32) + medians


class FPBasedResNetBottleneck(nn.Module):
    """Factorized-prior bottleneck replacing ResNet stem+layer1
    (reference `layer.py:444-550`): 3-conv GDN encoder (stride 4 total),
    entropy bottleneck over 24ch latent, 3-conv IGDN decoder to 256ch."""

    num_input_channels: int = 3
    num_bottleneck_channels: int = 24
    num_target_channels: int = 256
    encoder_channel_sizes: Optional[Sequence[int]] = None
    decoder_channel_sizes: Optional[Sequence[int]] = None
    # Conv compute dtype (bfloat16 -> MXU-rate matmuls for TRAINING
    # throughput; the entropy model always evaluates in float32 and
    # deploy symbol rounding casts back to f32, so coding semantics are
    # dtype-independent). Default float32 = reference numerics exactly.
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        enc = list(self.encoder_channel_sizes or [
            self.num_input_channels, self.num_bottleneck_channels * 4,
            self.num_bottleneck_channels * 2, self.num_bottleneck_channels])
        dec = list(self.decoder_channel_sizes or [
            enc[-1], self.num_target_channels * 2, self.num_target_channels,
            self.num_target_channels])
        self._enc_sizes, self._dec_sizes = enc, dec
        self.encoder = nn.Sequential([
            nn.Conv(enc[1], (5, 5), (2, 2), ((2, 2), (2, 2)), use_bias=False,
                    dtype=d, name='enc_conv0'),
            GDN1(enc[1], dtype=d, name='enc_gdn0'),
            nn.Conv(enc[2], (5, 5), (2, 2), ((2, 2), (2, 2)), use_bias=False,
                    dtype=d, name='enc_conv1'),
            GDN1(enc[2], dtype=d, name='enc_gdn1'),
            nn.Conv(enc[3], (2, 2), (1, 1), ((0, 0), (0, 0)), use_bias=False,
                    dtype=d, name='enc_conv2'),
        ])
        self.decoder = nn.Sequential([
            nn.Conv(dec[1], (2, 2), (1, 1), ((1, 1), (1, 1)), use_bias=False,
                    dtype=d, name='dec_conv0'),
            GDN1(dec[1], inverse=True, dtype=d, name='dec_igdn0'),
            nn.Conv(dec[2], (2, 2), (1, 1), ((0, 0), (0, 0)), use_bias=False,
                    dtype=d, name='dec_conv1'),
            GDN1(dec[2], inverse=True, dtype=d, name='dec_igdn1'),
            nn.Conv(dec[3], (2, 2), (1, 1), ((1, 1), (1, 1)), use_bias=False,
                    dtype=d, name='dec_conv2'),
        ])
        self.entropy_bottleneck = EntropyBottleneck(
            channels=self.num_bottleneck_channels)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        y = self.encoder(x).astype(jnp.float32)  # entropy math is f32
        if mode == 'train':
            y_hat, likelihoods = self.entropy_bottleneck(y, mode='noise')
            self.sow('entropy', 'eb_out', (y_hat, likelihoods))
        elif mode == 'finetune':
            y_hat, _ = self.entropy_bottleneck(y, mode='dequantize')
            y_hat = jax.lax.stop_gradient(y_hat)
        else:
            raise ValueError(f'unknown mode {mode} (deploy uses encode_ops)')
        return self.decoder(y_hat)

    # -- deploy path (device side of encode/decode; bytes made on host) ---
    def encode_ops(self, x, medians):
        """Latent integer symbols (round(y - median)) + latent shape."""
        y = self.encoder(x).astype(jnp.float32)
        symbols = jnp.round(y - medians).astype(jnp.int32)
        return {'symbols': symbols}

    def decode_ops(self, symbols, medians):
        y_hat = symbols.astype(jnp.float32) + medians
        return self.decoder(y_hat)


class SHPBasedResNetBottleneck(nn.Module):
    """Scale-hyperprior bottleneck (reference `layer.py:553-720`):
    g_a/g_s with GDN, hyper-encoder h_a over |y|, hyper-decoder h_s produces
    per-element scales for the Gaussian conditional."""

    num_input_channels: int = 3
    num_latent_channels: int = 16
    num_bottleneck_channels: int = 24
    num_target_channels: int = 256
    g_a_channel_sizes: Optional[Sequence[int]] = None
    g_s_channel_sizes: Optional[Sequence[int]] = None
    # conv compute dtype (see FPBasedResNetBottleneck.dtype): bf16 for
    # training throughput; entropy math and deploy rounding stay f32
    dtype: Any = jnp.float32

    def setup(self):
        g_a = list(self.g_a_channel_sizes or [
            self.num_input_channels, self.num_bottleneck_channels * 4,
            self.num_bottleneck_channels * 2, self.num_bottleneck_channels])
        bch = g_a[3]
        g_s = list(self.g_s_channel_sizes or [
            g_a[-1], self.num_target_channels * 2, self.num_target_channels,
            self.num_target_channels])
        lch = self.num_latent_channels
        self.g_a = nn.Sequential([
            nn.Conv(g_a[1], (5, 5), (2, 2), ((2, 2), (2, 2)), use_bias=False,
                    dtype=self.dtype, name='g_a_conv0'),
            GDN1(g_a[1], dtype=self.dtype, name='g_a_gdn0'),
            nn.Conv(g_a[2], (5, 5), (2, 2), ((2, 2), (2, 2)), use_bias=False,
                    dtype=self.dtype, name='g_a_conv1'),
            GDN1(g_a[2], dtype=self.dtype, name='g_a_gdn1'),
            nn.Conv(g_a[3], (2, 2), (1, 1), ((0, 0), (0, 0)), use_bias=False,
                    dtype=self.dtype, name='g_a_conv2'),
        ])
        self.g_s = nn.Sequential([
            nn.Conv(g_s[1], (2, 2), (1, 1), ((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='g_s_conv0'),
            GDN1(g_s[1], inverse=True, dtype=self.dtype, name='g_s_igdn0'),
            nn.Conv(g_s[2], (2, 2), (1, 1), ((0, 0), (0, 0)), use_bias=False,
                    dtype=self.dtype, name='g_s_conv1'),
            GDN1(g_s[2], inverse=True, dtype=self.dtype, name='g_s_igdn1'),
            nn.Conv(g_s[3], (2, 2), (1, 1), ((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='g_s_conv2'),
        ])
        self.h_a = self.make_h_a(bch, lch)
        self.h_s = self.make_h_s(bch, lch)
        self.entropy_bottleneck = EntropyBottleneck(channels=lch)
        self.gaussian_conditional = GaussianConditional()
        self._bch = bch

    def make_h_a(self, bch, lch):
        return nn.Sequential([
            nn.Conv(lch, (5, 5), (2, 2), ((1, 1), (1, 1)), use_bias=False,
                    name='h_a_conv0'),
            nn.relu,
            nn.Conv(lch, (5, 5), (2, 2), ((2, 2), (2, 2)), use_bias=False,
                    name='h_a_conv1'),
        ])

    def make_h_s(self, bch, lch):
        return nn.Sequential([
            nn.ConvTranspose(lch, (5, 5), (2, 2), ((3, 3), (3, 3)),
                             use_bias=False, name='h_s_deconv0'),
            lambda x: nn.leaky_relu(x, 0.01),
            nn.ConvTranspose(lch, (5, 5), (2, 2), ((3, 3), (3, 3)),
                             use_bias=False, name='h_s_deconv1'),
            lambda x: nn.leaky_relu(x, 0.01),
            nn.Conv(bch, (5, 5), (1, 1), ((0, 0), (0, 0)), use_bias=False,
                    name='h_s_conv2'),
        ])

    def hyper_input(self, y):
        return jnp.abs(y)

    def gaussian_params(self, h_s_out):
        """Scale-only hyperprior: h_s output is the scales, means None."""
        return h_s_out, None

    def __call__(self, x, mode: str = 'train', train: bool = False):
        y = self.g_a(x).astype(jnp.float32)  # entropy math is f32
        z = self.h_a(self.hyper_input(y)).astype(jnp.float32)
        if mode == 'train':
            z_hat, z_lik = self.entropy_bottleneck(z, mode='noise')
            scales, means = self.gaussian_params(self.h_s(z_hat))
            rng = self.make_rng('noise')
            y_hat, y_lik = self.gaussian_conditional(
                y, scales, means, mode='noise', rng=rng)
            self.sow('entropy', 'eb_out', (z_hat, z_lik))
            self.sow('entropy', 'gc_out', (y_hat, y_lik))
        elif mode == 'finetune':
            z_hat, _ = self.entropy_bottleneck(z, mode='dequantize')
            scales, means = self.gaussian_params(self.h_s(z_hat))
            y_hat, _ = self.gaussian_conditional(y, scales, means,
                                                 mode='dequantize')
            y_hat = jax.lax.stop_gradient(y_hat)
        else:
            raise ValueError(f'unknown mode {mode} (deploy uses encode_ops)')
        return self.g_s(y_hat)

    # -- deploy path ------------------------------------------------------
    def encode_ops(self, x, z_medians, scale_table):
        """Device-side half of compress: z symbols (factorized) and y
        symbols+indexes (gaussian). z_hat is reconstructed exactly as the
        decoder will (round with medians) so scales match bit-for-bit."""
        y = self.g_a(x).astype(jnp.float32)
        z = self.h_a(self.hyper_input(y)).astype(jnp.float32)
        z_symbols = jnp.round(z - z_medians).astype(jnp.int32)
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        scales, means = self.gaussian_params(self.h_s(z_hat))
        indexes = self.gaussian_conditional.build_indexes(scales, scale_table)
        y_symbols = (jnp.round(y - means) if means is not None
                     else jnp.round(y)).astype(jnp.int32)
        return {'y_symbols': y_symbols, 'y_indexes': indexes,
                'z_symbols': z_symbols}

    def decode_scales(self, z_symbols, z_medians, scale_table):
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        scales, means = self.gaussian_params(self.h_s(z_hat))
        indexes = self.gaussian_conditional.build_indexes(scales, scale_table)
        return indexes, means

    def decode_ops(self, y_symbols, z_symbols, z_medians):
        z_hat = z_symbols.astype(jnp.float32) + z_medians
        scales, means = self.gaussian_params(self.h_s(z_hat))
        y_hat = y_symbols.astype(jnp.float32)
        if means is not None:
            y_hat = y_hat + means
        return self.g_s(y_hat)


class MSHPBasedResNetBottleneck(SHPBasedResNetBottleneck):
    """Mean-scale hyperprior (reference `layer.py:723-817`): h_a sees y
    directly (not |y|); h_s emits 2x channels chunked into scales/means."""

    def make_h_a(self, bch, lch):
        return nn.Sequential([
            nn.Conv(lch, (5, 5), (2, 2), ((1, 1), (1, 1)), use_bias=False,
                    name='h_a_conv0'),
            lambda x: nn.leaky_relu(x, 0.01),
            nn.Conv(lch, (5, 5), (2, 2), ((2, 2), (2, 2)), use_bias=False,
                    name='h_a_conv1'),
        ])

    def make_h_s(self, bch, lch):
        return nn.Sequential([
            nn.ConvTranspose(lch, (5, 5), (2, 2), ((3, 3), (3, 3)),
                             use_bias=False, name='h_s_deconv0'),
            lambda x: nn.leaky_relu(x, 0.01),
            nn.ConvTranspose(lch * 3 // 2, (5, 5), (2, 2), ((3, 3), (3, 3)),
                             use_bias=False, name='h_s_deconv1'),
            lambda x: nn.leaky_relu(x, 0.01),
            nn.Conv(bch * 2, (5, 5), (1, 1), ((0, 0), (0, 0)), use_bias=False,
                    name='h_s_conv2'),
        ])

    def hyper_input(self, y):
        return y

    def gaussian_params(self, h_s_out):
        scales, means = jnp.split(h_s_out, 2, axis=-1)
        return scales, means


register_layer(FPBasedResNetBottleneck)
register_layer(SHPBasedResNetBottleneck)
register_layer(MSHPBasedResNetBottleneck)


def get_layer(cls_or_func_name: str, **kwargs):
    """Resolve a layer from the registry (reference `layer.py:820-835`)."""
    from ..registry import lookup
    entry = lookup('layer', cls_or_func_name)
    if entry is None:
        return None
    return entry(**kwargs)
