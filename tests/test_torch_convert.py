"""Torch→Flax checkpoint conversion tests, verified numerically with real
torch CPU layers (torch is available; torchvision is not, so the torch side
is built from raw torch.nn layers with torchvision-style names)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sc2bench_tpu.utils.torch_convert import (  # noqa: E402
    RESNET_RULES, convert_state_dict, merge_into_variables)


def test_conv_bn_linear_numeric_equivalence():
    """A torch conv+bn(eval)+linear pipeline and the converted flax stem
    must produce identical outputs."""
    tconv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    tbn = torch.nn.BatchNorm2d(64).eval()
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
    sd = {f'conv1.{k}': v for k, v in tconv.state_dict().items()}
    sd.update({f'bn1.{k}': v for k, v in tbn.state_dict().items()})

    from sc2bench_tpu.models.resnet import ResNetStem
    stem = ResNetStem()
    x = np.random.default_rng(0).normal(0, 1, (1, 32, 32, 3)) \
        .astype(np.float32)
    variables = stem.init({'params': jax.random.key(0)}, jnp.asarray(x))
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    converted = convert_state_dict(sd, [(r'^conv1$', 'conv1'),
                                        (r'^bn1$', 'bn1')])
    variables = merge_into_variables(variables, converted)

    out_flax = np.asarray(stem.apply(variables, jnp.asarray(x),
                                     train=False))
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tout = torch.nn.functional.max_pool2d(
            torch.relu(tbn(tconv(tx))), 3, stride=2, padding=1)
    out_torch = tout.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_flax, out_torch, rtol=1e-4, atol=1e-4)


def test_resnet_block_rules_cover_state_dict():
    """Every torchvision-style ResNet-50 key must map under RESNET_RULES."""
    keys = ['conv1.weight', 'bn1.weight', 'bn1.bias', 'bn1.running_mean',
            'bn1.running_var', 'fc.weight', 'fc.bias']
    for layer in range(1, 5):
        for block in range(3):
            for c in range(1, 4):
                keys += [f'layer{layer}.{block}.conv{c}.weight',
                         f'layer{layer}.{block}.bn{c}.weight',
                         f'layer{layer}.{block}.bn{c}.running_mean']
            keys += [f'layer{layer}.{block}.downsample.0.weight',
                     f'layer{layer}.{block}.downsample.1.running_var']
    sd = {k: np.zeros((2, 2, 1, 1)) if k.endswith('weight')
          and 'conv' in k or 'downsample.0' in k else np.zeros(2)
          for k in keys}
    converted = convert_state_dict(sd, RESNET_RULES)
    # spot checks
    assert 'conv1' in converted['params']['stem']
    assert 'block0' in converted['params']['layer1']
    assert 'downsample_bn' in converted['batch_stats']['layer3']['block1'] \
        or 'downsample_bn' in converted['params']['layer3']['block1']


def test_deconv_conversion_numeric():
    """torch ConvTranspose2d(k5 s2 p2 op1) == flax _deconv after kernel
    transpose — validates both the layout transform and the padding map."""
    tdeconv = torch.nn.ConvTranspose2d(4, 6, 5, stride=2, padding=2,
                                       output_padding=1, bias=True)
    from sc2bench_tpu.models.zoo import _deconv
    m = _deconv(6, 5, 2, 'd0')
    x = np.random.default_rng(1).normal(0, 1, (1, 8, 8, 4)) \
        .astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    from sc2bench_tpu.utils.torch_convert import convert_deconv_tensor
    kernel = convert_deconv_tensor(tdeconv.weight)
    variables = {'params': {'kernel': jnp.asarray(kernel),
                            'bias': jnp.asarray(
                                tdeconv.bias.detach().numpy())}}
    with jax.default_matmul_precision('highest'):
        out_flax = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(
            variables, jnp.asarray(x)))
    with torch.no_grad():
        tout = tdeconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_torch = tout.numpy().transpose(0, 2, 3, 1)
    assert out_flax.shape == out_torch.shape
    np.testing.assert_allclose(out_flax, out_torch, rtol=1e-4, atol=1e-4)


class _TorchGDN1(torch.nn.Module):
    """CompressAI GDN1 replica (abs-variant; params stored in sqrt space,
    NonNegativeParametrizer semantics — `/root/reference` uses
    compressai.layers.GDN1 at layer.py:478-494)."""

    _PED = 2.0 ** -18

    def __init__(self, ch, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = torch.nn.Parameter(
            torch.sqrt(torch.ones(ch) + self._PED))
        g = 0.1 * torch.eye(ch) + 0.01 * torch.rand(ch, ch)
        self.gamma = torch.nn.Parameter(torch.sqrt(g + self._PED))

    @staticmethod
    def _reparam(stored, minimum):
        bound = (minimum + _TorchGDN1._PED) ** 0.5
        return torch.clamp(stored, min=bound) ** 2 - _TorchGDN1._PED

    def forward(self, x):
        ch = x.shape[1]
        beta = self._reparam(self.beta, 1e-6)
        gamma = self._reparam(self.gamma, 0.0).view(ch, ch, 1, 1)
        norm = torch.nn.functional.conv2d(x.abs(), gamma, beta)
        return x * norm if self.inverse else x / norm


def _torch_fp_bottleneck(c_in=3, c_b=8, c_t=32):
    """Reference FPBasedResNetBottleneck encoder/decoder structure with
    the reference's exact Sequential key names (layer.py:476-496)."""
    enc_sizes = [c_in, c_b * 4, c_b * 2, c_b]
    dec_sizes = [c_b, c_t * 2, c_t, c_t]
    encoder = torch.nn.Sequential(
        torch.nn.Conv2d(enc_sizes[0], enc_sizes[1], 5, 2, 2, bias=False),
        _TorchGDN1(enc_sizes[1]),
        torch.nn.Conv2d(enc_sizes[1], enc_sizes[2], 5, 2, 2, bias=False),
        _TorchGDN1(enc_sizes[2]),
        torch.nn.Conv2d(enc_sizes[2], enc_sizes[3], 2, 1, 0, bias=False),
    )
    decoder = torch.nn.Sequential(
        torch.nn.Conv2d(dec_sizes[0], dec_sizes[1], 2, 1, 1, bias=False),
        _TorchGDN1(dec_sizes[1], inverse=True),
        torch.nn.Conv2d(dec_sizes[1], dec_sizes[2], 2, 1, 0, bias=False),
        _TorchGDN1(dec_sizes[2], inverse=True),
        torch.nn.Conv2d(dec_sizes[2], dec_sizes[3], 2, 1, 1, bias=False),
    )
    for m in list(encoder) + list(decoder):
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, 0, 0.05)
    return encoder, decoder


def test_fp_bottleneck_conversion_numeric():
    """Full reference-named FP bottleneck state dict -> flax: encoder and
    decoder forwards must match torch to float tolerance (pins conv
    stride/padding parity at 5s2/2s1 and the GDN sqrt-domain handling)."""
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.utils.torch_convert import FP_BOTTLENECK_RULES

    torch.manual_seed(0)
    encoder, decoder = _torch_fp_bottleneck()
    sd = {f'encoder.{k}': v for k, v in encoder.state_dict().items()}
    sd.update({f'decoder.{k}': v for k, v in decoder.state_dict().items()})

    module = FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                     num_target_channels=32)
    x = np.random.default_rng(1).normal(0, 1, (1, 32, 32, 3)) \
        .astype(np.float32)
    variables = jax.jit(
        lambda rngs, v: module.init(rngs, v, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)},
        jnp.asarray(x))
    converted = convert_state_dict(sd, FP_BOTTLENECK_RULES)
    variables = merge_into_variables(
        {'params': variables['params']}, converted)

    with torch.no_grad():
        t_lat = encoder(torch.from_numpy(x).permute(0, 3, 1, 2))
        t_out = decoder(t_lat)
    f_lat = module.apply(variables, jnp.asarray(x),
                         method=lambda m, v: m.encoder(v))
    np.testing.assert_allclose(
        np.asarray(f_lat), t_lat.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)
    f_out = module.apply(variables, f_lat,
                         method=lambda m, v: m.decoder(v))
    np.testing.assert_allclose(
        np.asarray(f_out), t_out.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)


def test_splittable_rules_cover_reference_checkpoint_keys():
    """Every key a reference entropic-student SplittableResNet50 checkpoint
    contains (bottleneck + entropy bottleneck + tail) must map under
    SPLITTABLE_RESNET_RULES; CompressAI registered buffers are rebuilt by
    update() and are the only expected skips."""
    from sc2bench_tpu.utils.torch_convert import SPLITTABLE_RESNET_RULES

    keys = []
    # bottleneck convs + GDN (reference layer.py:476-496)
    for seq in ('encoder', 'decoder'):
        for i in (0, 2, 4):
            keys.append(f'bottleneck_layer.{seq}.{i}.weight')
        for i in (1, 3):
            keys += [f'bottleneck_layer.{seq}.{i}.beta',
                     f'bottleneck_layer.{seq}.{i}.gamma']
    # compressai EntropyBottleneck params + rebuilt buffers
    for i in range(5):
        keys.append(f'bottleneck_layer.entropy_bottleneck._matrix{i}')
        keys.append(f'bottleneck_layer.entropy_bottleneck._bias{i}')
    for i in range(4):
        keys.append(f'bottleneck_layer.entropy_bottleneck._factor{i}')
    keys += ['bottleneck_layer.entropy_bottleneck.quantiles',
             'bottleneck_layer.entropy_bottleneck._quantized_cdf',
             'bottleneck_layer.entropy_bottleneck._offset',
             'bottleneck_layer.entropy_bottleneck._cdf_length']
    # torchvision tail (layer2..4 + fc)
    keys += ['layer2.0.conv1.weight', 'layer2.0.bn1.weight',
             'layer2.0.bn1.bias', 'layer2.0.bn1.running_mean',
             'layer2.0.bn1.running_var', 'layer2.0.downsample.0.weight',
             'layer2.0.downsample.1.weight', 'layer4.2.conv3.weight',
             'fc.weight', 'fc.bias']

    sd = {k: torch.zeros(2, 2, 2, 2) if k.endswith('weight') and
          'fc' not in k else torch.zeros(2, 2) for k in keys}
    converted = convert_state_dict(sd, SPLITTABLE_RESNET_RULES)
    flat = []

    def walk(node, path):
        for k, v in node.items():
            (walk(v, path + [k]) if isinstance(v, dict)
             else flat.append('/'.join(path + [k])))
    walk(converted['params'], [])
    walk(converted['batch_stats'], [])
    expected_skips = 3  # _quantized_cdf/_offset/_cdf_length buffers
    assert len(flat) == len(keys) - expected_skips, sorted(flat)
    assert 'bottleneck_layer/entropy_bottleneck/matrix_0' in flat
    assert 'bottleneck_layer/enc_gdn0/beta' in flat
    assert 'layer2/block0/downsample_conv/kernel' in flat
    assert 'fc/kernel' in flat
