"""Multi-stage training engine for classification.

Drives the reference's canonical recipes (SURVEY.md §2.3, §3.1): stage1
hint-distillation of the bottleneck (frozen tail) with β·bpp rate loss and
aux quantile loss, `epoch_to_update` triggering the table build + switch to
the STE-finetune forward, stage2 KD fine-tuning with frozen encoder+entropy
bottleneck. Checkpoints on best validation metric (reference
`image_classification.py:148-193`).
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import train_stage_configs
from ..datasets.image import (DataLoader, build_dataset,
                              build_sharded_loader)
from ..models.registry import load_classification_model
from ..models.runtime import SplitClassifierRuntime
from ..utils.ckpt import load_ckpt, save_ckpt
from ..utils.metrics import MetricLogger
from .box import DistillationBox, TrainingBox

logger = logging.getLogger(__name__)


def init_model(module, image_size=(224, 224), seed=0, init_kwargs=None):
    """Jitted parameter init — eager init dispatches op-by-op, which is
    pathologically slow over a remote-TPU tunnel."""
    x = jnp.zeros((1, *image_size, 3))
    kwargs = dict(init_kwargs or {})
    init_fn = jax.jit(lambda rngs, x: module.init(rngs, x, **kwargs))
    variables = init_fn(
        {'params': jax.random.key(seed), 'noise': jax.random.key(seed + 1)},
        x)
    return {'params': variables['params'],
            'batch_stats': variables.get('batch_stats', {})}


def transfer_matching_subtrees(student_vars, teacher_vars, paths):
    """Copy teacher param/batch_stats subtrees into the student where names
    match (tail init before distillation — the functional equivalent of the
    reference loading torchvision weights into the splittable model,
    `backbone.py:260-273`). Leaves are materialized as fresh buffers: the
    student's train state is donated per step, so aliasing teacher buffers
    would delete them."""
    out = jax.tree.map(lambda x: x, student_vars)  # shallow-ish copy
    for coll in ('params', 'batch_stats'):
        s, t = out.get(coll, {}), teacher_vars.get(coll, {})
        for p in paths:
            if p in t and p in s:
                s[p] = jax.tree.map(lambda a: jnp.array(a), t[p])
    return out


def localized(variables):
    """Host copy of a (possibly multi-process-global) variables tree, safe
    to feed a process-local jit (deploy runtimes, per-shard eval). No-op
    in single-process runs."""
    return jax.device_get(variables) if jax.process_count() > 1 \
        else variables


def scale_stage_lrs(stages, mesh):
    """World-size LR scaling (the reference's `-adjust_lr`,
    `image_classification.py:47-48,152`): multiply every stage's optimizer
    learning rate by the number of data-parallel replicas (mesh devices).
    Returns deep-enough copies — the input stage dicts share subtrees with
    the loaded config and must not be mutated."""
    world = int(mesh.devices.size) if mesh is not None else 1
    if world <= 1:
        return stages
    out = []
    for stage_cfg in stages:
        stage_cfg = dict(stage_cfg)
        opt = stage_cfg.get('optimizer')
        if opt and 'lr' in opt.get('kwargs', {}):
            kwargs = dict(opt['kwargs'])
            kwargs['lr'] = float(kwargs['lr']) * world
            stage_cfg['optimizer'] = {**opt, 'kwargs': kwargs}
            logger.info('adjust_lr: stage %s lr %s -> %s (world=%d)',
                        stage_cfg.get('name'), opt['kwargs']['lr'],
                        kwargs['lr'], world)
        out.append(stage_cfg)
    return out


class MetricAccumulator:
    """Device-side running sums for the train hot loop: `push` adds the
    step's (still-on-device) loss/aux scalars without any host transfer;
    every `interval` steps `drain` syncs ONCE, checks finiteness (NaN/Inf
    propagates through the sum, so the reference's abort semantics are kept
    with at-most-`interval`-step delay) and feeds the MetricLogger."""

    def __init__(self, meter, interval: int = 50):
        self.meter = meter
        self.interval = max(int(interval), 1)
        self._loss_sum = None
        self._aux_sum = None
        self._pending = 0

    def push(self, loss, aux):
        self._loss_sum = loss if self._loss_sum is None \
            else self._loss_sum + loss
        self._aux_sum = aux if self._aux_sum is None \
            else self._aux_sum + aux
        self._pending += 1
        if self._pending >= self.interval:
            self.drain()

    def drain(self):
        if self._pending == 0:
            return
        # one transfer for both sums
        ls, axs = (float(v) for v in np.asarray(
            jnp.stack([jnp.asarray(self._loss_sum),
                       jnp.asarray(self._aux_sum)])))
        n = self._pending
        self._loss_sum = self._aux_sum = None
        self._pending = 0
        if not np.isfinite(ls):
            raise ValueError(
                f'loss sum over the last {n} steps is {ls}; aborting '
                '(reference behavior image_classification.py:87)')
        self.meter.meters['loss'].update(ls / n, n=n)
        self.meter.meters['aux'].update(axs / n, n=n)


def top_k_accuracy(logits, targets, ks=(1, 5)):
    out = {}
    order = jnp.argsort(logits, axis=-1)[:, ::-1]
    for k in ks:
        hit = jnp.any(order[:, :k] == targets[:, None], axis=-1)
        out[f'acc{k}'] = jnp.mean(hit.astype(jnp.float32))
    return out


def _eval_loop_accumulated(meter, data_loader, logits_fn):
    """Dispatch-only eval loop: per-batch top-k means are weighted by batch
    size and summed in a device-resident vector, so the loop issues NO
    blocking host transfer — on a remote TPU each per-batch `float()` costs
    a full tunnel round trip (docs/performance.md) — and ONE sync at the
    end converts the totals. `logits_fn(x) -> (logits, batch_size)`."""
    sums, names, n_total = None, None, 0
    for x, y in data_loader:
        logits, n = logits_fn(x)
        accs = top_k_accuracy(logits, jnp.asarray(y))
        if names is None:
            names = sorted(accs)
        vec = jnp.stack([accs[k] for k in names]) * n
        if sums is None:
            sums = vec
        else:
            if vec.sharding != sums.sharding:
                # a short final batch skips the mesh sharding; colocate
                # device-to-device (async) before accumulating
                vec = jax.device_put(vec, sums.sharding)
            sums = sums + vec
        n_total += n
    if names:
        vals = np.asarray(jax.device_get(sums)) / max(n_total, 1)
        for name, v in zip(names, vals):
            meter.meters[name].update(float(v), n=n_total)


class ClassificationEngine:
    """Builds models/datasets from a config dict and runs train/test."""

    def __init__(self, config, image_size=(224, 224), seed=42, mesh='auto'):
        """`mesh='auto'` builds a 1-D data mesh over ALL visible devices
        when more than one is present — the reference's default DDP wrap
        (config `wrapper: 'DistributedDataParallel'`, SURVEY.md §2.4).
        Pass an explicit `jax.sharding.Mesh` or None to override."""
        from ..registry import import_dependencies
        import_dependencies(config.get('dependencies'))
        self.config = config
        if mesh == 'auto':
            from ..parallel.mesh import get_mesh
            mesh = get_mesh() if jax.device_count() > 1 else None
        self.mesh = mesh
        self.image_size = tuple(image_size)
        self.seed = int(seed)
        models_config = config.get('models', {})
        self.wrapper = None
        if 'wrapper' in models_config:
            # input/feature-compression families: full-pipeline wrapper,
            # test-only (reference wrapper configs have no train section)
            from ..models.wrapper import get_wrapped_classification_model
            self.wrapper = get_wrapped_classification_model(
                models_config['wrapper'])
            return
        self.teacher_module = None
        self.teacher_variables = None
        if 'teacher_model' in models_config:
            tm_cfg = models_config['teacher_model']
            self.teacher_module = load_classification_model(tm_cfg)
            self.teacher_variables = init_model(
                self.teacher_module, self.image_size, seed=7,
                init_kwargs={'train': False})
            if tm_cfg.get('ckpt'):
                try:
                    self.teacher_variables, _, _ = load_ckpt(
                        tm_cfg['ckpt'], self.teacher_variables)
                except FileNotFoundError:
                    # A configured-but-missing teacher anchor silently turns
                    # distillation into noise; fail hard unless explicitly
                    # allowed (tests/smoke runs set allow_missing_teacher).
                    if not config.get('allow_missing_teacher', False):
                        raise FileNotFoundError(
                            f"teacher ckpt {tm_cfg['ckpt']} not found — "
                            'distilling from RANDOM teacher weights is '
                            'almost never intended. Provide the checkpoint '
                            '(see utils/torch_convert.py for converting '
                            'reference weights) or set '
                            'allow_missing_teacher: true in the config.')
                    logger.error('teacher ckpt %s missing; RANDOM teacher '
                                 'weights (allow_missing_teacher set)',
                                 tm_cfg['ckpt'])
        sm_cfg = models_config.get('student_model', models_config.get('model'))
        self.student_module = load_classification_model(sm_cfg)
        self.student_variables = init_model(
            self.student_module, self.image_size, seed=0,
            init_kwargs={'mode': 'train'})
        self.student_ckpt = sm_cfg.get('ckpt')
        if self.student_ckpt:
            try:
                self.student_variables, _, _ = load_ckpt(
                    self.student_ckpt, self.student_variables)
                logger.info('loaded student ckpt %s', self.student_ckpt)
            except FileNotFoundError:
                pass
        if self.teacher_variables is not None:
            self.student_variables = transfer_matching_subtrees(
                self.student_variables, self.teacher_variables,
                ('layer2', 'layer3', 'layer4', 'fc'))
        # optional device-side input normalization (config 'input_norm':
        # [mean, std] in 0-1 scale): deploy paths then accept uint8 images
        # directly — 4x less host->device traffic than normalized float32
        input_norm = config.get('input_norm')
        self.runtime = SplitClassifierRuntime(
            self.student_module, self.student_variables,
            input_norm=tuple(input_norm) if input_norm else None)
        self._eval_fn = None
        self._teacher_eval_fn = None

    # ---- data -----------------------------------------------------------
    def build_loader(self, split_config, shard_over_processes=False):
        """`shard_over_processes=True` gives each host process its own
        disjoint dataset shard (the reference's DistributedSampler; batches
        are then additionally sharded over this process's devices by the
        box). Single-process runs are unaffected."""
        return build_sharded_loader(
            split_config, shard_over_processes=shard_over_processes)

    # ---- evaluation -----------------------------------------------------
    def evaluate(self, data_loader, use_deploy_path=False, log_freq=100):
        """Top-1/top-5 (+ data size when analysis is active). Deploy path =
        real bitstream at batch 1 (reference `evaluate`,
        `image_classification.py:106-145`)."""
        meter = MetricLogger()
        if use_deploy_path:
            self.runtime.variables = localized(self.student_variables)
            self.runtime.eval()
            # software-pipelined batch-1 stream (runtime.stream_deploy):
            # encodes overlap host entropy coding across images; per-sample
            # byte accounting identical to the serial loop
            chunk_x, chunk_y = [], []

            use_device_wire = self.config.get('deploy_wire') == 'device'

            def drain():
                if not chunk_x:
                    return
                k = len(chunk_x)
                t0 = time.time()
                if use_device_wire:
                    # TPU-side entropy coding (ops/rans/device.py): no
                    # symbol-sized host transfer; byte accounting exact
                    logits_list = self.runtime.stream_deploy_device(
                        chunk_x)
                else:
                    logits_list = self.runtime.stream_deploy(chunk_x)
                # accuracy over the whole chunk in ONE device computation:
                # a per-image np.asarray(logits) would pay one host sync
                # (a full tunnel round trip) per image
                logits = jnp.concatenate(logits_list)
                ys = jnp.asarray(np.concatenate(
                    [np.atleast_1d(np.asarray(y)) for y in chunk_y]))
                accs = top_k_accuracy(logits, ys)
                dt = (time.time() - t0) / k
                meter.meters['model_time'].update(dt, n=k)
                for name, v in accs.items():
                    meter.meters[name].update(float(v), n=k)
                chunk_x.clear()
                chunk_y.clear()

            streamable = self.runtime.bottleneck_updated \
                and self.runtime.codec is not None
            for x, y in data_loader:
                x = jnp.asarray(x)
                if x.shape[0] != 1 or not streamable:
                    # stream is strictly batch-1 over the bitstream path
                    t0 = time.time()
                    logits = self.runtime(x)
                    accs = top_k_accuracy(np.asarray(logits), np.asarray(y))
                    meter.update(model_time=time.time() - t0,
                                 **{k: float(v) for k, v in accs.items()})
                    continue
                chunk_x.append(x)
                chunk_y.append(y)
                if len(chunk_x) == 64:
                    drain()
            drain()
        else:
            # Deterministic eval forward: quantize/dequantize with medians
            # ('finetune' mode) regardless of bottleneck_updated, matching
            # the reference's CompressAI eval behavior (no noise RNG); a
            # fresh jit per engine so nothing stale is baked into the trace.
            if self._eval_fn is None:
                self._eval_fn = jax.jit(
                    lambda variables, x: self.student_module.apply(
                        variables, x, mode='finetune', train=False))
            # shard the eval batch over the data mesh when multiple devices
            # are available (the reference's DP eval, SURVEY.md §2.4).
            # Multi-process: shard only over THIS process's devices — each
            # process scores its own loader shard and the metric sync does
            # the cross-process reduction (reference DDP eval). Variables
            # are localized (host copy) so globally-committed train state
            # doesn't pin the eval jit to the unreachable global mesh.
            # Localization (host copy off the global mesh) and batch
            # sharding are independent concerns: after multi-process
            # training the student variables are committed to the global
            # mesh, so they must be pulled local even when `-no_dp_eval`
            # disables batch sharding — otherwise the eval jit is pinned
            # to a mesh this process cannot address alone.
            variables = self.student_variables
            if jax.process_count() > 1:
                variables = jax.device_get(variables)
            mesh = None if self.config.get('no_dp_eval') else self.mesh
            if mesh is not None:
                from ..parallel.mesh import data_sharding, get_mesh
                if jax.process_count() > 1:
                    mesh = get_mesh(local=True)

            def logits_fn(x):
                xb = jnp.asarray(x)
                if mesh is not None and xb.shape[0] % mesh.devices.size == 0:
                    xb = jax.device_put(xb, data_sharding(mesh))
                return self._eval_fn(variables, xb), int(xb.shape[0])

            _eval_loop_accumulated(meter, data_loader, logits_fn)
        meter.synchronize_between_processes()
        result = {k: m.global_avg for k, m in meter.meters.items()}
        logger.info('eval: %s', result)
        return result

    def evaluate_teacher(self, data_loader):
        """Score the teacher anchor (reference tests the teacher too
        unless `-student_only`, `image_classification.py:240-242`).
        Returns None when no teacher is configured."""
        if self.teacher_module is None:
            return None
        if self._teacher_eval_fn is None:
            self._teacher_eval_fn = jax.jit(
                lambda variables, x: self.teacher_module.apply(
                    variables, x, train=False))
        meter = MetricLogger()
        variables = localized(self.teacher_variables)

        def logits_fn(x):
            xb = jnp.asarray(x)
            return self._teacher_eval_fn(variables, xb), int(xb.shape[0])

        _eval_loop_accumulated(meter, data_loader, logits_fn)
        meter.synchronize_between_processes()
        result = {k: m.global_avg for k, m in meter.meters.items()}
        logger.info('teacher eval: %s', result)
        return result

    # ---- training -------------------------------------------------------
    def train(self, dst_ckpt=None, resume: bool = False):
        """`resume=True` restores the full train state (params + optimizer)
        saved alongside `dst_ckpt`, continuing from the recorded
        stage/epoch (reference `--start_epoch` semantics)."""
        from ..utils.ckpt import load_train_state, save_train_state
        if self.wrapper is not None:
            raise ValueError('wrapper (input/feature compression) configs '
                             'are test-only — run with -test_only '
                             '(reference protocol)')
        train_config = self.config.get('train', {})
        stages = train_stage_configs(train_config)
        if self.config.get('adjust_lr'):
            stages = scale_stage_lrs(stages, self.mesh)
        resume_info = None  # (state_dict payload applied per matching stage)
        train_loader = self.build_loader(train_config.get(
            'train_data_loader', {'dataset': {'key':
                'SyntheticClassificationDataset', 'kwargs': {}},
                'batch_size': 8, 'shuffle': True}),
            shard_over_processes=True)
        val_loader = self.build_loader(train_config.get(
            'val_data_loader', {'dataset': {'key':
                'SyntheticClassificationDataset', 'kwargs': {}},
                'batch_size': 8}),
            shard_over_processes=True)
        # NaN/Inf abort (reference image_classification.py:87-88) is checked
        # on a device-accumulated loss sum every k steps — NaN propagates
        # through the sum, so nothing is missed, and the hot loop issues no
        # per-step blocking host transfer (one sync per k steps/epoch end).
        nan_check_interval = int(train_config.get('nan_check_interval', 50))
        best_metric = -1.0
        rng = jax.random.key(self.seed)
        for stage_cfg in stages:
            logger.info('=== stage %s ===', stage_cfg.get('name'))
            box_cls = DistillationBox if self.teacher_module else TrainingBox
            kwargs = {}
            if box_cls is DistillationBox:
                kwargs = {'teacher_module': self.teacher_module,
                          'teacher_variables': self.teacher_variables}
            box = box_cls(
                self.student_module, self.student_variables, stage_cfg,
                steps_per_epoch=max(len(train_loader), 1),
                student_mode='finetune' if self.runtime.bottleneck_updated
                else 'train', mesh=self.mesh, **kwargs)
            epoch_to_update = stage_cfg.get('epoch_to_update')
            num_epochs = int(stage_cfg.get('num_epochs', 1))
            start_epoch = 0
            if resume and dst_ckpt and resume_info is None:
                loaded = load_train_state(dst_ckpt, box.state)
                if loaded is not None:
                    state, saved_epoch, saved_stage, best_metric = loaded
                    if saved_stage == stage_cfg.get('name'):
                        box.state = state
                        start_epoch = saved_epoch + 1
                        logger.info('resumed stage %s at epoch %d',
                                    saved_stage, start_epoch)
                    resume_info = (saved_stage, saved_epoch)
            for epoch in range(start_epoch, num_epochs):
                meter = MetricLogger()
                acc = MetricAccumulator(meter, nan_check_interval)
                for x, y in train_loader:
                    rng, step_rng = jax.random.split(rng)
                    metrics = box.train_step(jnp.asarray(x), jnp.asarray(y),
                                             step_rng)
                    acc.push(sum(jax.tree.leaves(metrics['loss'])),
                             metrics['aux_loss'])
                acc.drain()
                logger.info('stage %s epoch %d: %s', stage_cfg.get('name'),
                            epoch, str(meter))
                self.student_variables = box.student_variables
                if epoch_to_update is not None \
                        and epoch + 1 >= int(epoch_to_update) \
                        and not self.runtime.bottleneck_updated:
                    self.runtime.variables = self.student_variables
                    self.runtime.update()
                    box.student_mode = 'finetune'
                    logger.info('bottleneck updated (tables built)')
                result = self.evaluate(val_loader)
                metric = result.get('acc1', 0.0)
                if metric > best_metric:
                    best_metric = metric
                    if dst_ckpt:
                        save_ckpt(dst_ckpt, self.student_variables,
                                  meta={'best_metric': best_metric})
                if dst_ckpt:
                    save_train_state(dst_ckpt, box.state, epoch,
                                     stage_cfg.get('name'), best_metric)
            self.student_variables = box.student_variables
        # final update if never triggered (test protocol expects tables)
        self.runtime.variables = self.student_variables
        if not self.runtime.bottleneck_updated:
            self.runtime.update()
        return best_metric

    def test(self):
        test_config = self.config.get('test', {})
        loader = self.build_loader(test_config.get(
            'test_data_loader', {'dataset': {'key':
                'SyntheticClassificationDataset', 'kwargs': {}},
                'batch_size': 1}))
        if self.wrapper is not None:
            return self._test_wrapper(loader)
        self.runtime.variables = localized(self.student_variables)
        if not self.runtime.bottleneck_updated and self.runtime.codec:
            self.runtime.update()
        self.runtime.activate_analysis()
        result = self.evaluate(loader, use_deploy_path=bool(
            self.runtime.codec and self.runtime.bottleneck_updated))
        summaries = self.runtime.summarize()
        return result, summaries

    def _test_wrapper(self, loader):
        """Eval through a full-pipeline wrapper (codec/neural input or
        feature compression): per-sample host codec round-trip + jitted
        classifier, accuracy + data-size summaries (reference
        `evaluate(...)` over wrapped models, `wrapper.py:29-135`)."""
        if hasattr(self.wrapper, 'activate_analysis'):
            self.wrapper.activate_analysis()
        meter = MetricLogger()
        for x, y in loader:
            images = [np.asarray(img) for img in np.asarray(x)]
            logits = self.wrapper(images)
            accs = top_k_accuracy(np.asarray(logits), np.asarray(y))
            meter.update(**{k: float(v) for k, v in accs.items()})
        meter.synchronize_between_processes()
        result = {k: m.global_avg for k, m in meter.meters.items()}
        summaries = self.wrapper.summarize() \
            if hasattr(self.wrapper, 'summarize') else []
        logger.info('wrapper eval: %s', result)
        return result, summaries
