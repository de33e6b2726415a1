"""EntropicClassifier: a base classifier split at a configurable layer with
an EntropyBottleneckLayer at the split point (reference
`/root/reference/sc2bench/models/wrapper.py:196-264`, the `fine-tuning`
config family: split after {stem(avgpool variant), layer1..layer4}).

The head (stem..split) and tail (split..fc) reuse the base ResNet's
parameters — the reference builds them with torchdistill `redesign_model`
over the same pretrained weights.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.entropy.factorized import EntropyBottleneck
from .resnet import ResNet

SPLIT_CHANNELS = {'stem': 64, 'layer1': 256, 'layer2': 512,
                  'layer3': 1024, 'layer4': 2048, 'avgpool': 2048}


class EntropicClassifierModule(nn.Module):
    """base head → EntropyBottleneck → base tail."""

    base: ResNet
    split_layer: str = 'layer1'

    def setup(self):
        self.entropy_bottleneck = EntropyBottleneck(
            channels=SPLIT_CHANNELS[self.split_layer])

    def _feature(self, x, train=False):
        if self.split_layer == 'avgpool':
            z = self.base.forward_until(x, 'layer4', train)
            return jnp.mean(z, axis=(1, 2))[:, None, None, :]
        return self.base.forward_until(x, self.split_layer, train)

    def _tail(self, z_hat, train=False):
        if self.split_layer == 'avgpool':
            return self.base.forward_from(z_hat[:, 0, 0, :], 'avgpool', train)
        return self.base.forward_from(z_hat, self.split_layer, train)

    def __call__(self, x, mode: str = 'train', train: bool = False):
        z = self._feature(x, train)
        eb_mode = 'noise' if mode == 'train' else 'dequantize'
        z_hat, likelihoods = self.entropy_bottleneck(z, mode=eb_mode)
        self.sow('entropy', 'eb_out', (z_hat, likelihoods))
        if mode == 'finetune':
            z_hat = jax.lax.stop_gradient(z_hat)
        return self._tail(z_hat, train)

    # module-level deploy ops (runtime duck-typing)
    def encode_ops(self, x, medians):
        z = self._feature(x)
        return {'symbols': jnp.round(z - medians).astype(jnp.int32)}

    def decode_ops_to_logits(self, symbols, medians):
        z_hat = symbols.astype(jnp.float32) + medians
        return self._tail(z_hat)

    @property
    def eb_param_path(self):
        return 'entropy_bottleneck'


def entropic_classifier(base_name='resnet50', split_layer='layer1',
                        num_classes=1000, **kwargs):
    """Builder for the fine-tuning family configs
    (reference `configs/ilsvrc2012/supervised_compression/fine-tuning/`)."""
    from .resnet import RESNET_BUILDERS
    base = RESNET_BUILDERS[base_name](num_classes=num_classes,
                                      sow_intermediates=False)
    return EntropicClassifierModule(base=base, split_layer=split_layer)


from ..registry import register_model  # noqa: E402

register_model(entropic_classifier)
