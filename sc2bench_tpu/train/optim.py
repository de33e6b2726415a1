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


def label_params(params, frozen_prefixes: Sequence[str] = ()):
    """Label pytree: 'aux' for quantile params, 'frozen' for frozen-module
    prefixes, 'main' otherwise."""

    def label(path, _):
        p = _path_str(path)
        if p.endswith('quantiles'):
            return 'aux'
        segs = p.split('.')
        for prefix in frozen_prefixes:
            pre = prefix.split('.')
            # match on full path segments so frozen 'fc' does not also
            # freeze 'fc_head.*'
            if any(segs[i:i + len(pre)] == pre
                   for i in range(len(segs) - len(pre) + 1)):
                return 'frozen'
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
    zero-updates for frozen params."""
    labels = label_params(params, frozen_modules)
    main_tx = build_optimizer(optimizer_config, scheduler_config,
                              steps_per_epoch, num_epochs, grad_accum_step)
    tx = optax.multi_transform(
        {'main': main_tx, 'aux': optax.adam(aux_lr),
         'frozen': optax.set_to_zero()},
        labels)
    return labels, tx
