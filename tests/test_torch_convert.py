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
