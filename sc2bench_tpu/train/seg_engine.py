"""Segmentation training/eval engine (PASCAL VOC DeepLabv3).

Drives the reference recipe (`script/task/semantic_segmentation.py`,
SURVEY.md §3.4): distillation or direct CE training with poly LR, mIoU
model selection, `epoch_to_update: 0` reuse of an ImageNet-trained
bottleneck, and batch-1 deploy eval with data-size analysis.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import train_stage_configs
from ..datasets.image import (DataLoader, build_dataset,
                              build_sharded_loader)
from ..models.segmentation.wrapper import SplitSegmentationRuntime
from ..registry import get as registry_get
from ..utils.ckpt import load_ckpt, save_ckpt
from ..utils.metrics import MetricLogger
from ..utils.seg_eval import SegEvaluator
from .box import DistillationBox, TrainingBox
from .engine import localized

logger = logging.getLogger(__name__)


class SegmentationEngine:
    def __init__(self, config, image_size=(512, 512), num_classes=21,
                 mesh='auto'):
        from ..registry import import_dependencies
        import_dependencies(config.get('dependencies'))
        self.config = config
        if mesh == 'auto':
            from ..parallel.mesh import get_mesh
            mesh = get_mesh() if jax.device_count() > 1 else None
        self.mesh = mesh
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        models_config = config.get('models', {})
        self.wrapper = None
        if 'wrapper' in models_config:
            # input-compression segmentation (reference seg `wrapper.py`):
            # test-only full-pipeline wrapper
            from ..models.segmentation.wrapper import \
                get_wrapped_segmentation_model
            self.wrapper = get_wrapped_segmentation_model(
                models_config['wrapper'])
            return
        self.teacher_module = None
        self.teacher_variables = None
        if 'teacher_model' in models_config:
            tm = models_config['teacher_model']
            self.teacher_module = registry_get('model', tm['key'])(
                **tm.get('kwargs', {}))
            self.teacher_variables = self._init(self.teacher_module, seed=7)
        sm = models_config.get('student_model', models_config.get('model'))
        self.student_module = registry_get('model', sm['key'])(
            **sm.get('kwargs', {}))
        self.student_variables = self._init(self.student_module, seed=0)
        if sm.get('ckpt'):
            try:
                self.student_variables, _, _ = load_ckpt(
                    sm['ckpt'], self.student_variables)
            except FileNotFoundError:
                pass
        self.runtime = SplitSegmentationRuntime(self.student_module,
                                                self.student_variables)
        self._eval_fn = {}

    def _init(self, module, seed):
        x = jnp.zeros((1, *self.image_size, 3))
        variables = jax.jit(
            lambda r, x: module.init(r, x, mode='train'))(
            {'params': jax.random.key(seed),
             'noise': jax.random.key(seed + 1)}, x)
        return {'params': variables['params'],
                'batch_stats': variables.get('batch_stats', {})}

    def build_loader(self, split_config, shard_over_processes=False):
        from ..transforms.collator import pascal_seg_collate_fn
        return build_sharded_loader(
            split_config, collate_fn=pascal_seg_collate_fn,
            shard_over_processes=shard_over_processes)

    def evaluate(self, data_loader, use_deploy_path=False,
                 use_teacher=False):
        """`use_teacher=True` scores the teacher anchor via the plain
        jitted path (reference tests it too unless -student_only)."""
        evaluator = SegEvaluator(self.num_classes)
        if use_teacher:
            assert not use_deploy_path, 'teacher eval is plain-forward'
            if self.teacher_module is None:
                return None
        if use_deploy_path:
            self.runtime.variables = localized(self.student_variables)
            self.runtime.eval()
            if self.runtime.bottleneck_updated:
                # pipelined deploy in 16-image chunks (encodes overlap host
                # entropy coding; per-sample byte accounting unchanged)
                chunk_x, chunk_y = [], []

                use_device_wire = \
                    self.config.get('deploy_wire') == 'device'

                def drain():
                    if not chunk_x:
                        return
                    stream = self.runtime.stream_deploy_device(chunk_x) \
                        if use_device_wire \
                        else self.runtime.stream_deploy(chunk_x)
                    for out, y in zip(stream, chunk_y):
                        evaluator.update(y, np.asarray(jnp.argmax(out, -1)))
                    chunk_x.clear()
                    chunk_y.clear()

                for x, y in data_loader:
                    chunk_x.append(jnp.asarray(x))
                    chunk_y.append(y)
                    if len(chunk_x) == 16:
                        drain()
                drain()
            else:
                for x, y in data_loader:
                    out = self.runtime(jnp.asarray(x))
                    pred = np.asarray(jnp.argmax(out, -1))
                    evaluator.update(y, pred)
        else:
            key = 'teacher' if use_teacher else 'eval'
            module = self.teacher_module if use_teacher \
                else self.student_module
            variables = localized(self.teacher_variables if use_teacher
                                  else self.student_variables)
            if key not in self._eval_fn:
                n = self.num_classes

                def _conf(v, x, y, _module=module, _n=n):
                    # Fused forward + confusion-matrix histogram: the eval
                    # loop then transfers one (n, n) matrix per batch
                    # asynchronously instead of a full int pred map + a
                    # blocking host bincount (each blocking read costs a
                    # tunnel round trip on remote TPU). 255-ignore pixels
                    # land in an overflow bin that is sliced away. int32
                    # counts: fine through ~2e9 pixels (VOC val is ~4e8).
                    out = _module.apply(v, x, mode='finetune', train=False)
                    pred = jnp.argmax(out['out'], -1)
                    t = y.reshape(-1).astype(jnp.int32)
                    p = pred.reshape(-1).astype(jnp.int32)
                    valid = (t >= 0) & (t < _n)
                    idx = jnp.where(valid, _n * t + p, _n * _n)
                    return jnp.bincount(
                        idx, length=_n * _n + 1)[:-1].reshape(_n, _n)

                self._eval_fn[key] = jax.jit(_conf)
            # Device matrix is int32; fold into the host int64 evaluator
            # matrix before the accumulated pixel count can wrap a single
            # cell (int32 overflows past ~2.1e9 — a dominant background
            # class can absorb nearly every pixel, so the flush interval
            # is derived from the per-batch pixel count, not a fixed batch
            # count: flush once ~1e9 pixels have accumulated).
            mat = None
            pending_px = 0
            for x, y in data_loader:
                xa = jnp.asarray(x)
                m = self._eval_fn[key](variables, xa,
                                       jnp.asarray(np.asarray(y)))
                mat = m if mat is None else mat + m
                pending_px += int(np.prod(xa.shape[:1] + xa.shape[1:3]))
                if pending_px >= 1_000_000_000:
                    evaluator.mat += np.asarray(
                        jax.device_get(mat)).astype(np.int64)
                    mat, pending_px = None, 0
            if mat is not None:
                evaluator.mat += np.asarray(
                    jax.device_get(mat)).astype(np.int64)
        evaluator.reduce_from_all_processes()
        acc_global, acc, iou = evaluator.compute()
        miou = float(iou.mean())
        logger.info('seg eval: global acc %.4f mIoU %.4f', acc_global, miou)
        return {'acc_global': float(acc_global), 'miou': miou}

    def train(self, dst_ckpt=None):
        if self.wrapper is not None:
            raise ValueError('input-compression segmentation configs are '
                             'test-only — run with -test_only')
        from .engine import MetricAccumulator, scale_stage_lrs
        train_config = self.config.get('train', {})
        stages = train_stage_configs(train_config)
        if self.config.get('adjust_lr'):
            stages = scale_stage_lrs(stages, self.mesh)
        train_loader = self.build_loader(train_config['train_data_loader'],
                                         shard_over_processes=True)
        val_loader = self.build_loader(train_config['val_data_loader'],
                                       shard_over_processes=True)
        nan_check_interval = int(train_config.get('nan_check_interval', 50))
        best = -1.0
        rng = jax.random.key(0)
        for stage_cfg in stages:
            box_cls = DistillationBox if self.teacher_module else TrainingBox
            kwargs = {'teacher_module': self.teacher_module,
                      'teacher_variables': self.teacher_variables} \
                if self.teacher_module else {}
            box = box_cls(self.student_module, self.student_variables,
                          stage_cfg,
                          steps_per_epoch=max(len(train_loader), 1),
                          student_mode='finetune'
                          if self.runtime.bottleneck_updated else 'train',
                          mesh=self.mesh, **kwargs)
            epoch_to_update = stage_cfg.get('epoch_to_update')
            if epoch_to_update == 0 and not self.runtime.bottleneck_updated:
                self.runtime.variables = self.student_variables
                self.runtime.update()
                box.student_mode = 'finetune'
            for epoch in range(int(stage_cfg.get('num_epochs', 1))):
                meter = MetricLogger()
                acc = MetricAccumulator(meter, nan_check_interval)
                for x, y in train_loader:
                    rng, srng = jax.random.split(rng)
                    metrics = box.train_step(jnp.asarray(x), jnp.asarray(y),
                                             srng)
                    acc.push(sum(jax.tree.leaves(metrics['loss'])),
                             metrics['aux_loss'])
                acc.drain()
                self.student_variables = box.student_variables
                if epoch_to_update and epoch + 1 >= int(epoch_to_update) \
                        and not self.runtime.bottleneck_updated:
                    self.runtime.variables = self.student_variables
                    self.runtime.update()
                    box.student_mode = 'finetune'
                result = self.evaluate(val_loader)
                if result['miou'] > best:
                    best = result['miou']
                    if dst_ckpt:
                        save_ckpt(dst_ckpt, self.student_variables,
                                  meta={'best_miou': best})
                logger.info('epoch %d: %s (best mIoU %.4f)', epoch,
                            str(meter), best)
        self.runtime.variables = self.student_variables
        if not self.runtime.bottleneck_updated:
            self.runtime.update()
        return best

    def _test_wrapper(self, loader):
        """Eval through the input-compression wrapper: host codec/neural
        round-trip then segmentation (reference seg `wrapper.py:12-117`)."""
        if hasattr(self.wrapper, 'activate_analysis'):
            self.wrapper.activate_analysis()
        evaluator = SegEvaluator(self.num_classes)
        for x, y in loader:
            out = self.wrapper([np.asarray(img) for img in np.asarray(x)])
            logits = out['out'] if isinstance(out, dict) else out
            evaluator.update(y, np.asarray(jnp.argmax(logits, -1)))
        evaluator.reduce_from_all_processes()
        acc_global, acc, iou = evaluator.compute()
        result = {'acc_global': float(acc_global),
                  'miou': float(iou.mean())}
        summaries = self.wrapper.summarize() \
            if hasattr(self.wrapper, 'summarize') else []
        logger.info('wrapper seg eval: %s', result)
        return result, summaries

    def test(self):
        test_config = self.config.get('test', {})
        loader = self.build_loader(test_config['test_data_loader'])
        if self.wrapper is not None:
            return self._test_wrapper(loader)
        self.runtime.variables = self.student_variables
        if not self.runtime.bottleneck_updated:
            self.runtime.update()
        self.runtime.activate_analysis()
        result = self.evaluate(loader, use_deploy_path=True)
        return result, self.runtime.summarize()
