"""Model name→builder resolution across local registries and the
compression-model zoo (reference `/root/reference/sc2bench/models/registry.py`).

The reference's 4-way fallback (torchdistill official → timm → backbone
registry → torch.hub, `registry.py:108-139`) becomes: builtin classifiers →
'model' registry → error. Pretrained-weight download is impossible in this
offline build; `ckpt` paths load Orbax/msgpack checkpoints instead.
"""
from __future__ import annotations

import logging

from ..registry import get as registry_get, lookup
from .resnet import RESNET_BUILDERS

logger = logging.getLogger(__name__)

# Neural input-compression codecs (the CompressAI-zoo equivalents): built
# from the same bottleneck architectures applied to images.
COMPRESSION_MODEL_FAMILIES = (
    'factorized_prior', 'bmshj2018_factorized',
    'scale_hyperprior', 'bmshj2018_hyperprior',
    'mean_scale_hyperprior', 'mbt2018_mean',
)


def get_compression_model(compression_model_config):
    """Build a neural image-compression model (reference `registry.py:83-105`
    resolves compressai.zoo names). Returns an image-codec runtime from
    models/zoo.py."""
    from .zoo import build_image_codec
    key = compression_model_config['key']
    kwargs = compression_model_config.get('kwargs', {})
    ckpt = compression_model_config.get('ckpt')
    return build_image_codec(key, ckpt=ckpt, **kwargs)


def load_classification_model(model_config, num_classes=1000):
    """Resolve a classifier module from config (reference
    `registry.py:108-139`). Returns an *uninitialized* Flax module; parameter
    init / checkpoint load is the caller's job (train box or eval script)."""
    key = model_config.get('key', model_config.get('name'))
    kwargs = dict(model_config.get('kwargs', {}))
    kwargs.setdefault('num_classes', num_classes)
    if key in RESNET_BUILDERS:
        kwargs.pop('ckpt', None)
        return RESNET_BUILDERS[key](
            num_classes=kwargs.get('num_classes', 1000))
    entry = lookup('model', key)
    if entry is not None:
        return entry(**kwargs)
    raise KeyError(f'model `{key}` not found (builtin: '
                   f'{sorted(RESNET_BUILDERS)}; registry: see '
                   f"registry.names('model'))")


def get_backbone(key, **kwargs):
    return registry_get('model', key)(**kwargs)
