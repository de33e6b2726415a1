"""YAML experiment-config loader.

Keeps the reference's config surface (SURVEY.md §5.6): top-level keys
`dependencies` / `datasets` / `models` / `train` / `test`, multi-stage
`train.stage1..N`, `frozen_modules`, `criterion.sub_terms`,
`epoch_to_update`. Supported tags: `!join` (string concat of scalars/anchors)
like torchdistill's; `!import_call` is deliberately replaced by *lazy*
registry instantiation (`{key, kwargs}` dicts resolved by builders) — no
object construction at parse time, which keeps configs pure data and
jit-friendly.
"""
from __future__ import annotations

import json


import yaml

from .common.config_util import overwrite_config


class _Loader(yaml.SafeLoader):
    pass


def _join(loader, node):
    seq = loader.construct_sequence(node)
    return ''.join(str(s) for s in seq)


def _getattr_tag(loader, node):
    seq = loader.construct_sequence(node)
    obj_path, attr = seq[0], seq[1]
    import importlib
    mod = importlib.import_module(obj_path)
    return getattr(mod, attr)


_Loader.add_constructor('!join', _join)
_Loader.add_constructor('!getattr', _getattr_tag)


def load_config(path, json_overwrite: str | dict | None = None) -> dict:
    """Load a YAML config; optionally deep-merge a JSON override string
    (the reference's `--json` flag, `image_classification.py:208-210`)."""
    with open(path) as f:
        config = yaml.load(f, Loader=_Loader)
    if json_overwrite:
        if isinstance(json_overwrite, str):
            json_overwrite = json.loads(json_overwrite)
        overwrite_config(config, json_overwrite)
    return config


def train_stage_configs(train_config: dict) -> list[dict]:
    """Return ordered stage configs: explicit stage1..N keys, else the flat
    train config as a single stage."""
    stages = sorted(k for k in train_config if k.startswith('stage'))
    if stages:
        out = []
        for k in stages:
            cfg = dict(train_config[k])
            cfg.setdefault('name', k)
            out.append(cfg)
        return out
    cfg = dict(train_config)
    cfg.setdefault('name', 'train')
    return [cfg]
