"""Global string->object registries.

The reference populates per-module registries via decorators
(`/root/reference/sc2bench/models/layer.py:15-38`, `analysis.py:11-21`) and a
YAML loader instantiates registered names. We keep one namespaced registry so
every subsystem (layers, models, analyzers, transforms, datasets, losses,
wrappers, optimizers, schedulers) shares the same lookup discipline.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def _registry(namespace: str) -> Dict[str, Any]:
    return _REGISTRIES.setdefault(namespace, {})


def register(namespace: str, name: str | None = None) -> Callable:
    """Decorator registering a class or function under `namespace`."""

    def deco(obj):
        _registry(namespace)[name or obj.__name__] = obj
        return obj

    return deco


def lookup(namespace: str, name: str, default=None):
    return _registry(namespace).get(name, default)


def get(namespace: str, name: str):
    reg = _registry(namespace)
    if name not in reg:
        raise KeyError(
            f'`{name}` is not registered in namespace `{namespace}`. '
            f'Known: {sorted(reg)}')
    return reg[name]


def build(namespace: str, name: str, **kwargs):
    """Instantiate (or call) a registered entry with kwargs."""
    return get(namespace, name)(**kwargs)


def names(namespace: str):
    return sorted(_registry(namespace))


def import_dependencies(dependencies):
    """Import modules listed in a config `dependencies` section so their
    registration decorators run (reference behavior:
    `script/task/image_classification.py:212`)."""
    if not dependencies:
        return
    for dep in dependencies:
        name = dep['name'] if isinstance(dep, dict) else dep
        importlib.import_module(name)


# Shorthand decorators for the common namespaces.
def register_layer(obj=None, *, name=None):
    if obj is None:
        return register('layer', name)
    return register('layer')(obj)


def register_analyzer(obj=None, *, name=None):
    if obj is None:
        return register('analyzer', name)
    return register('analyzer')(obj)


def register_model(obj=None, *, name=None):
    if obj is None:
        return register('model', name)
    return register('model')(obj)


def register_wrapper(obj=None, *, name=None):
    if obj is None:
        return register('wrapper', name)
    return register('wrapper')(obj)


def register_transform(obj=None, *, name=None):
    if obj is None:
        return register('transform', name)
    return register('transform')(obj)


def register_dataset(obj=None, *, name=None):
    if obj is None:
        return register('dataset', name)
    return register('dataset')(obj)


def register_loss(obj=None, *, name=None):
    if obj is None:
        return register('loss', name)
    return register('loss')(obj)


def register_collate(obj=None, *, name=None):
    if obj is None:
        return register('collate', name)
    return register('collate')(obj)
