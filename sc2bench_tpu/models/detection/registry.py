"""Detection model resolution (reference
`/root/reference/sc2bench/models/detection/registry.py:55-84`), with the
`update_before_ckpt` contract (tables before checkpoint load)."""
from __future__ import annotations

import logging

from ...registry import get as registry_get

logger = logging.getLogger(__name__)


def load_detection_model(model_config, image_size=(800, 800)):
    """Build + init a detection module from config; returns
    (module, variables). `init_image_size` in the config overrides the
    canvas used for parameter init (shapes are init-independent)."""
    import jax
    import jax.numpy as jnp
    image_size = tuple(model_config.get('init_image_size', image_size))
    key = model_config['key']
    module = registry_get('model', key)(**model_config.get('kwargs', {}))
    x = jnp.zeros((1, *image_size, 3))
    variables = jax.jit(lambda r, x: module.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    ckpt = model_config.get('ckpt')
    if ckpt:
        from ...utils.ckpt import load_ckpt
        try:
            variables, _, _ = load_ckpt(ckpt, variables)
            logger.info('loaded detection ckpt %s', ckpt)
        except FileNotFoundError:
            logger.warning('detection ckpt %s missing; random init', ckpt)
    return module, variables
