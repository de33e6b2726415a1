"""Optax optimizer/scheduler builders from the reference's config schema.

Config shapes (SURVEY.md §2.3, e.g. entropic-student yaml `:230-260`):
  optimizer: {key: 'SGD'|'Adam', kwargs: {lr, momentum, weight_decay, ...}}
  scheduler: {key: 'MultiStepLR'|'CosineAnnealingLR'|'LambdaLR'|'poly',
              kwargs: {milestones, gamma, ...}}
  frozen_modules: [param-path prefixes]  — excluded from updates
  grad_accum_step: N                      — optax.MultiSteps

The aux (quantile) parameters of every EntropyBottleneck are trained by a
separate Adam on the aux loss — the functional equivalent of the reference's
aux-optimizer parameter group (`script/task/image_classification.py:75-77`);
realized here as an `optax.multi_transform` over labels
{'main','aux','frozen'}.
"""
from __future__ import annotations

from typing import Sequence

import jax
import optax


def _path_str(path) -> str:
    return '.'.join(str(getattr(k, 'key', k)) for k in path)


def _matches(path_str: str, prefix: str) -> bool:
    """True when `prefix` (dotted) appears as consecutive full path
    segments — so 'fc' does not also match 'fc_head.*'. Segments may be
    fnmatch globs: flax Sequential flattens named children to the parent
    scope, so the reference's `bottleneck_layer.encoder` module boundary
    is expressed as `bottleneck_layer.enc_*` here."""
    from fnmatch import fnmatchcase
    segs = path_str.split('.')
    pre = prefix.split('.')

    def seg_eq(s, p):
        return fnmatchcase(s, p) if any(ch in p for ch in '*?[') else s == p

    return any(all(seg_eq(s, p) for s, p in zip(segs[i:], pre))
               for i in range(len(segs) - len(pre) + 1))


def label_params(params, frozen_prefixes: Sequence[str] = (),
                 module_wise: Sequence[dict] = ()):
    """Label pytree: 'aux' for quantile params, 'frozen' for frozen-module
    prefixes, 'mw{i}' for module-wise optimizer groups, 'main' otherwise."""

    def label(path, _):
        p = _path_str(path)
        if p.endswith('quantiles'):
            return 'aux'
        for prefix in frozen_prefixes:
            if _matches(p, prefix):
                return 'frozen'
        for i, entry in enumerate(module_wise):
            if _matches(p, entry['module']):
                return f'mw{i}'
        return 'main'

    return jax.tree_util.tree_map_with_path(label, params)


def build_schedule(scheduler_config, base_lr: float,
                   steps_per_epoch: int = 1, num_epochs: int = 1):
    """Epoch-milestone schedules mapped to per-step optax schedules."""
    if not scheduler_config:
        return base_lr
    key = scheduler_config['key']
    kwargs = dict(scheduler_config.get('kwargs', {}))
    if key == 'MultiStepLR':
        gamma = kwargs.get('gamma', 0.1)
        milestones = kwargs.get('milestones', [])
        boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if key == 'CosineAnnealingLR':
        t_max = kwargs.get('T_max', num_epochs) * steps_per_epoch
        return optax.cosine_decay_schedule(base_lr, t_max,
                                           alpha=kwargs.get('eta_min', 0.0)
                                           / max(base_lr, 1e-12))
    if key in ('poly', 'LambdaLR', 'PolynomialLR'):
        # reference det/seg recipe: lr * (1 - iter/total) ** 0.9
        power = kwargs.get('power', 0.9)
        total = kwargs.get('total_iters', num_epochs * steps_per_epoch)
        return optax.polynomial_schedule(base_lr, 0.0, power, total)
    if key == 'StepLR':
        step = kwargs.get('step_size', 1) * steps_per_epoch
        gamma = kwargs.get('gamma', 0.1)
        return optax.exponential_decay(base_lr, step, gamma, staircase=True)
    raise KeyError(f'unknown scheduler `{key}`')


def build_optimizer(optimizer_config, scheduler_config=None,
                    steps_per_epoch: int = 1, num_epochs: int = 1,
                    grad_accum_step: int = 1):
    """Main-branch gradient transformation from config."""
    key = optimizer_config['key']
    kwargs = dict(optimizer_config.get('kwargs', {}))
    lr = kwargs.pop('lr', 1e-3)
    schedule = build_schedule(scheduler_config, lr, steps_per_epoch,
                              num_epochs)
    wd = kwargs.pop('weight_decay', 0.0)
    if key in ('SGD', 'sgd'):
        momentum = kwargs.pop('momentum', 0.0)
        tx = optax.sgd(schedule, momentum=momentum or None)
    elif key in ('Adam', 'adam'):
        b1, b2 = kwargs.pop('betas', (0.9, 0.999))
        tx = optax.adam(schedule, b1=b1, b2=b2,
                        eps=kwargs.pop('eps', 1e-8))
    elif key in ('AdamW', 'adamw'):
        b1, b2 = kwargs.pop('betas', (0.9, 0.999))
        tx = optax.adamw(schedule, b1=b1, b2=b2,
                         eps=kwargs.pop('eps', 1e-8), weight_decay=wd)
        wd = 0.0
    else:
        raise KeyError(f'unknown optimizer `{key}`')
    if wd:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    if grad_accum_step > 1:
        tx = optax.MultiSteps(tx, grad_accum_step)
    return tx


def build_multi_optimizer(params, optimizer_config, scheduler_config=None,
                          frozen_modules: Sequence[str] = (),
                          steps_per_epoch: int = 1, num_epochs: int = 1,
                          grad_accum_step: int = 1, aux_lr: float = 1e-3):
    """(labels, optax transform): main optimizer + aux Adam for quantiles +
    zero-updates for frozen params + per-module-group optimizers for the
    reference's `module_wise_kwargs` parameter groups (e.g. the seg
    recipe's 10x head LR, reference voc es yaml stage2 optimizer)."""
    module_wise = list(optimizer_config.get('module_wise_kwargs', ()))
    labels = label_params(params, frozen_modules, module_wise)
    main_tx = build_optimizer(optimizer_config, scheduler_config,
                              steps_per_epoch, num_epochs, grad_accum_step)
    branches = {'main': main_tx, 'aux': optax.adam(aux_lr),
                'frozen': optax.set_to_zero()}
    for i, entry in enumerate(module_wise):
        group_cfg = {'key': optimizer_config['key'],
                     'kwargs': {**optimizer_config.get('kwargs', {}),
                                **entry.get('kwargs', {})}}
        branches[f'mw{i}'] = build_optimizer(
            group_cfg, scheduler_config, steps_per_epoch, num_epochs,
            grad_accum_step)
    tx = optax.multi_transform(branches, labels)
    return labels, tx
