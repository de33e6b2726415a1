"""Training / distillation boxes.

Functional re-design of the torchdistill engine the reference delegates to
(`get_training_box`/`get_distillation_box`, SURVEY.md §3.1): instead of
forward hooks mutating an io_dict, teacher and student run with Flax
intermediate capture and the flattened capture pytree *is* the io_dict fed to
a config-composed `WeightedSumLoss`. One jitted `train_step` fuses teacher
forward (no grad), student forward, loss, backward and the masked
main/aux/frozen optimizer update; under a data mesh the gradient all-reduce
is inserted by XLA (SURVEY.md §2.4).
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..loss import build_criterion
from ..ops.math import softplus_inv  # noqa: F401  (re-export convenience)
from .optim import build_multi_optimizer

logger = logging.getLogger(__name__)


def flatten_io(tree, prefix='') -> dict:
    """Nested capture dict -> dotted-path io_dict; unwraps flax's
    length-1 sow tuples."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_io(v, f'{prefix}{k}.' if prefix or k else k))
        return out
    value = tree
    if isinstance(value, tuple) and len(value) == 1:
        value = value[0]
    out[prefix.rstrip('.')] = value
    return out


def factorized_aux_loss(params, tail_mass: float = 1e-9):
    """Total quantile (aux) loss over every EntropyBottleneck found in the
    params tree — identified by co-located 'quantiles' and 'matrix_0' leaves.
    Density params are detached (aux optimizer trains quantiles only,
    reference `script/task/image_classification.py:75-77`)."""
    total = jnp.zeros(())
    target = float(np.log(2.0 / tail_mass - 1.0))
    targets = jnp.asarray([[-target, 0.0, target]], jnp.float32)[None]

    def visit(subtree):
        nonlocal total
        if not isinstance(subtree, dict):
            return
        if 'quantiles' in subtree and 'matrix_0' in subtree:
            logits = subtree['quantiles']
            i = 0
            while f'matrix_{i}' in subtree:
                m = jax.lax.stop_gradient(
                    jax.nn.softplus(subtree[f'matrix_{i}']))
                b = jax.lax.stop_gradient(subtree[f'bias_{i}'])
                logits = jnp.einsum('cij,cjm->cim', m, logits) + b
                if f'factor_{i}' in subtree:
                    f = jax.lax.stop_gradient(jnp.tanh(subtree[f'factor_{i}']))
                    logits = logits + f * jnp.tanh(logits)
                i += 1
            total = total + jnp.sum(jnp.abs(logits - targets))
            return
        for v in subtree.values():
            visit(v)

    visit(params)
    return total


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class DistillationBox:
    """One training stage: teacher (frozen) + student + criterion + masked
    optimizer. `student_mode` is 'train' (noise) before `update()` and
    'finetune' (STE-dequantize) after — the reference's post-update stage-2
    behavior (SURVEY.md §3.5)."""

    def __init__(self, student_module, student_variables, stage_config,
                 teacher_module=None, teacher_variables=None,
                 steps_per_epoch: int = 1, student_mode: str = 'train',
                 train_bn: Optional[bool] = None, mesh=None):
        self.student_module = student_module
        self.teacher_module = teacher_module
        self.teacher_variables = teacher_variables
        self.mesh = mesh
        self.stage_config = stage_config
        self.student_mode = student_mode
        num_epochs = int(stage_config.get('num_epochs', 1))
        self.num_epochs = num_epochs
        criterion_cfg = stage_config.get('criterion', {
            'key': 'CrossEntropyLoss', 'kwargs': {'module_path': 'output'}})
        self.criterion = build_criterion(criterion_cfg)
        frozen = stage_config.get('frozen_modules', [])
        self.train_bn = (stage_config.get('train_bn', True)
                         if train_bn is None else train_bn)
        optimizer_cfg = stage_config.get('optimizer',
                                         {'key': 'SGD', 'kwargs': {'lr': 0.01}})
        scheduler_cfg = stage_config.get('scheduler')
        grad_accum = int(stage_config.get('grad_accum_step', 1))
        params = student_variables['params']
        self.labels, self.tx = build_multi_optimizer(
            params, optimizer_cfg, scheduler_cfg, frozen,
            steps_per_epoch=steps_per_epoch, num_epochs=num_epochs,
            grad_accum_step=grad_accum,
            aux_lr=float(stage_config.get('aux_lr', 1e-3)))
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=student_variables.get('batch_stats', {}),
            opt_state=self.tx.init(params))
        # Data-parallel over a device mesh (the reference's DDP wrap,
        # config `wrapper: 'DistributedDataParallel'` — SURVEY.md §2.4):
        # replicate train state + teacher over the mesh; train_step shards
        # each batch over 'data' and XLA's GSPMD partitioner inserts the
        # gradient all-reduce over ICI during the jitted update.
        if mesh is not None:
            from ..parallel.mesh import replicate
            repl = replicate(mesh)
            self.state = jax.device_put(self.state, repl)
            if self.teacher_variables is not None:
                self.teacher_variables = jax.device_put(
                    self.teacher_variables, repl)
        # donate the train state: params/opt-state buffers are reused
        # in-place, halving peak HBM for the update
        self._train_step = jax.jit(self._step, donate_argnums=(0,),
                                   static_argnames=('student_mode',))

    # ---- pure step ------------------------------------------------------
    def _teacher_io(self, x):
        if self.teacher_module is None:
            return {}
        t_out, t_state = self.teacher_module.apply(
            self.teacher_variables, x, train=False,
            mutable=['intermediates'])
        io = flatten_io(t_state.get('intermediates', {}))
        if isinstance(t_out, dict):
            for k, v in t_out.items():
                io[f'output.{k}'] = v
            io['output'] = t_out.get('out', next(iter(t_out.values())))
        else:
            io['output'] = t_out
        return io

    def _step(self, state: TrainState, x, y, rng, student_mode: str):
        teacher_io = self._teacher_io(x)

        def loss_fn(params):
            # Frozen params take no update (optax set_to_zero), so their
            # weight-gradients are pure waste: stop_gradient them here and
            # the VJP never emits their weight-grad convs (activation
            # gradients still flow THROUGH the frozen layers, which hint
            # losses like stage-1's layer4 MSE need). Cuts ~15% of the
            # stage-1 step FLOPs with bit-identical updates.
            params = jax.tree.map(
                lambda p, label: jax.lax.stop_gradient(p)
                if label == 'frozen' else p, params, self.labels)
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            mutable = ['intermediates', 'entropy']
            if self.train_bn:
                mutable.append('batch_stats')
            s_out, s_state = self.student_module.apply(
                variables, x, mode=student_mode, train=self.train_bn,
                rngs={'noise': rng}, mutable=mutable)
            io = flatten_io(s_state.get('intermediates', {}))
            io.update(flatten_io(s_state.get('entropy', {})))
            if isinstance(s_out, dict):
                # segmentation-style dict output: 'output' = main head,
                # 'output.<k>' for each head
                for k, v in s_out.items():
                    io[f'output.{k}'] = v
                io['output'] = s_out.get('out', next(iter(s_out.values())))
            else:
                io['output'] = s_out
            main_loss, detail = self.criterion(io, teacher_io, y)
            aux = factorized_aux_loss(params)
            new_bs = s_state.get('batch_stats', state.batch_stats)
            return main_loss + aux, (new_bs, detail, aux, s_out)

        grads, (new_bs, detail, aux, s_out) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'loss': detail, 'aux_loss': aux}
        if y is not None and hasattr(s_out, 'ndim') and s_out.ndim == 2:
            metrics['acc1'] = jnp.mean(
                (jnp.argmax(s_out, -1) == y).astype(jnp.float32))
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), metrics

    # ---- public ---------------------------------------------------------
    def shard_batch(self, x, y):
        """Place a batch onto the data mesh, sharded over 'data' (no-op
        without a mesh; a single-process partial final batch runs
        replicated).

        Multi-process: each process holds only ITS loader shard of the
        global batch; the shards are assembled into one global array over
        the global mesh (`jax.make_array_from_process_local_data`) — the
        gradient all-reduce then spans all hosts, exactly the reference's
        multi-node DDP (`init_distributed_mode`, SURVEY.md §5.8). A final
        partial batch is padded per process by repeating its last row up
        to the per-process device count (the same duplicate-to-even rule
        torch's DistributedSampler applies to the epoch): leaving it
        process-local would hand the jit per-process-DIFFERENT arrays it
        assumes replicated — no all-reduce, silently desynchronized
        state."""
        if self.mesh is None:
            return x, y
        from ..parallel.mesh import data_sharding
        n = self.mesh.devices.size
        if jax.process_count() > 1:
            ds = data_sharding(self.mesh)
            per = max(n // jax.process_count(), 1)
            rem = x.shape[0] % per

            def pad(a):
                a = np.asarray(a)
                reps = np.repeat(a[-1:], per - rem, axis=0)
                return np.concatenate([a, reps], axis=0)

            if rem:
                x = pad(x)
                if y is not None:
                    y = jax.tree.map(pad, y)
            x = jax.make_array_from_process_local_data(ds, np.asarray(x))
            if y is not None:
                y = jax.tree.map(
                    lambda a: jax.make_array_from_process_local_data(
                        ds, np.asarray(a)), y)
        elif x.shape[0] % n == 0:
            ds = data_sharding(self.mesh)
            x = jax.device_put(x, ds)
            if y is not None:
                y = jax.tree.map(lambda a: jax.device_put(a, ds), y)
        return x, y

    def train_step(self, x, y, rng):
        x, y = self.shard_batch(x, y)
        self.state, metrics = self._train_step(
            self.state, x, y, rng, student_mode=self.student_mode)
        return metrics

    @property
    def student_variables(self):
        return {'params': self.state.params,
                'batch_stats': self.state.batch_stats}


class TrainingBox(DistillationBox):
    """Teacher-free stage (reference `get_training_box`)."""

    def __init__(self, student_module, student_variables, stage_config,
                 **kwargs):
        super().__init__(student_module, student_variables, stage_config,
                         teacher_module=None, teacher_variables=None,
                         **kwargs)
