"""Config dict utilities (reference: `sc2bench/common/config_util.py:1-17`)."""
from __future__ import annotations


def overwrite_config(config: dict, overwrite_dict: dict) -> dict:
    """Recursively deep-merge `overwrite_dict` into `config`, in place.

    Scalar/list values replace; nested dicts merge. This backs the `--json`
    CLI override used by sweep scripts.
    """
    for key, value in overwrite_dict.items():
        if key in config and isinstance(value, dict) and isinstance(config[key], dict):
            overwrite_config(config[key], value)
        else:
            config[key] = value
    return config
