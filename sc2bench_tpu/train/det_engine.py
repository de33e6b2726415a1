"""Detection training/eval engine (COCO Faster R-CNN).

Drives the reference recipe (`script/task/object_detection.py`, SURVEY.md
§3.3): stage1 head-distillation of backbone features (the HeadRCNN aux
contract), optional full detection losses, val-mAP model selection, and
batch-1 deploy eval with data-size accounting. The native CocoEvaluator
(utils/coco_eval.py) replaces pycocotools.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import train_stage_configs
from ..datasets.coco import pad_detection_targets
from ..datasets.image import (DataLoader, build_dataset,
                              build_sharded_loader)
from ..models.detection.rcnn import detection_loss, postprocess_detections
from ..models.detection.transform import RCNNTransform
from ..registry import get as registry_get
from ..utils.ckpt import load_ckpt, save_ckpt
from ..utils.coco_eval import CocoEvaluator
from ..utils.metrics import MetricLogger
from .box import DistillationBox
from .engine import localized

logger = logging.getLogger(__name__)


class DetectionBox(DistillationBox):
    """DistillationBox + optional Faster R-CNN task losses. The batch is
    (images NHWC, padded targets dict); hint terms read captured backbone
    features, detection terms run on dense RPN/RoI outputs."""

    def __init__(self, *args, detection_loss_weight=1.0, **kwargs):
        self.detection_loss_weight = detection_loss_weight
        super().__init__(*args, **kwargs)

    def _step(self, state, x, targets, rng, student_mode: str):
        from .box import TrainState, factorized_aux_loss, flatten_io
        import optax
        teacher_io = self._teacher_io(x)
        rng_noise, rng_det = jax.random.split(rng)

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            mutable = ['intermediates', 'entropy']
            if self.train_bn:
                mutable.append('batch_stats')
            # With task losses on, skip the full-proposal box head: the
            # head runs only on the sampled 512 proposals below
            # (torchvision select_training_samples semantics).
            use_sampled = bool(self.detection_loss_weight) \
                and targets is not None
            outputs, s_state = self.student_module.apply(
                variables, x, mode=student_mode, train=self.train_bn,
                rngs={'noise': rng_noise}, mutable=mutable,
                rpn_only=use_sampled)
            io = flatten_io(s_state.get('intermediates', {}))
            io.update(flatten_io(s_state.get('entropy', {})))
            detail = {}
            main_loss = 0.0
            if use_sampled:
                def apply_roi(feats, props):
                    return self.student_module.apply(
                        variables, feats, props, outputs['image_hw'],
                        method=lambda m, f, p, hw: m.roi_predict(f, p, hw))
                det, roi_out = detection_loss(outputs, targets, rng_det,
                                              apply_roi=apply_roi,
                                              return_roi_outputs=True)
                # criterion terms on 'output' see the sampled-head logits
                io['output'] = roi_out[0]
                for k, v in det.items():
                    detail[k] = v
                main_loss = main_loss + self.detection_loss_weight \
                    * sum(det.values())
            else:
                io['output'] = outputs['class_logits']
            crit_loss, crit_detail = self.criterion(io, teacher_io, None)
            detail.update(crit_detail)
            main_loss = main_loss + crit_loss
            aux = factorized_aux_loss(params)
            new_bs = s_state.get('batch_stats', state.batch_stats)
            return main_loss + aux, (new_bs, detail, aux)

        grads, (new_bs, detail, aux) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), \
            {'loss': detail, 'aux_loss': aux}


class DetectionEngine:
    def __init__(self, config, canvas_size=None, mesh='auto'):
        from ..registry import import_dependencies
        import_dependencies(config.get('dependencies'))
        self.config = config
        if mesh == 'auto':
            from ..parallel.mesh import get_mesh
            mesh = get_mesh() if jax.device_count() > 1 else None
        self.mesh = mesh
        models_config = config.get('models', {})
        # Default eval geometry = the reference's min/max 800/1333
        # (torchvision defaults via `/root/reference/sc2bench/models/
        # detection/rcnn.py:113-166`), with the landscape/portrait/square
        # canvas buckets so the number of compiled program shapes is
        # bounded at 3 instead of padding every image to the square
        # worst case. Tiny test configs override via canvas_size/min_size.
        if canvas_size is None:
            canvas_size = int(config.get('canvas_size', 1333))
        min_size = int(config.get('min_size', 800))
        buckets = config.get('canvas_buckets')
        if buckets is None and canvas_size > min_size:
            buckets = True
        self.transform = RCNNTransform(
            min_size=min_size, max_size=canvas_size, size_divisible=32,
            canvas_buckets=buckets)
        self.canvas = self.transform.canvas_hw()
        self.wrapper = None
        if 'wrapper' in models_config:
            # input-compression detection (reference `detection/wrapper.py`):
            # test-only full-pipeline wrapper
            from ..models.detection.wrapper import get_wrapped_detection_model
            self.wrapper = get_wrapped_detection_model(
                models_config['wrapper'])
            return
        self.teacher_module = None
        self.teacher_variables = None
        if 'teacher_model' in models_config:
            tm = models_config['teacher_model']
            self.teacher_module = registry_get('model', tm['key'])(
                **tm.get('kwargs', {}))
            self.teacher_variables = self._init(self.teacher_module, 7)
        sm = models_config.get('student_model', models_config.get('model'))
        self.student_module = registry_get('model', sm['key'])(
            **sm.get('kwargs', {}))
        self.student_variables = self._init(self.student_module, 0)
        if sm.get('ckpt'):
            try:
                self.student_variables, _, _ = load_ckpt(
                    sm['ckpt'], self.student_variables)
            except FileNotFoundError:
                pass
        self.max_boxes = int(config.get('max_boxes', 64))
        # Evaluation IoU types: config/CLI override, else model-derived
        # like the reference's `get_iou_types`
        # (`object_detection.py:98-115`): Mask R-CNN adds 'segm',
        # Keypoint R-CNN adds 'keypoints'.
        from ..models.detection.rcnn import KeypointRCNN, MaskRCNN
        if 'iou_types' in config:
            self.iou_types = [str(t) for t in config['iou_types']]
        else:
            self.iou_types = ['bbox']
            if isinstance(self.student_module, MaskRCNN):
                self.iou_types.append('segm')
            if isinstance(self.student_module, KeypointRCNN):
                self.iou_types.append('keypoints')
        self.bottleneck_updated = False
        self._eval_fn = {}

    def _init(self, module, seed):
        x = jnp.zeros((1, *self.canvas, 3))
        variables = jax.jit(
            lambda r, x: module.init(r, x, mode='train'))(
            {'params': jax.random.key(seed),
             'noise': jax.random.key(seed + 1)}, x)
        return {'params': variables['params'],
                'batch_stats': variables.get('batch_stats', {})}

    def build_loader(self, split_config, shard_over_processes=False):
        from ..transforms.collator import coco_collate_fn
        return build_sharded_loader(
            split_config, collate_fn=coco_collate_fn,
            shard_over_processes=shard_over_processes)

    def _prepare_batch(self, images, targets):
        batch, scales, _ = self.transform(list(images))
        padded = pad_detection_targets(list(targets), self.max_boxes)
        padded['boxes'] = padded['boxes'] * scales[:, None, None]
        return jnp.asarray(batch), jax.tree.map(jnp.asarray, padded), scales

    def evaluate(self, data_loader, runtime=None, use_teacher=False):
        """runtime: a SplitDetectionRuntime for the deploy path (real
        bitstream + data-size analysis; bbox only — the reference\'s
        entropic students are Faster R-CNN); None = plain jitted forward
        scoring every configured iou_type (bbox / segm via the mask head
        + paste_masks_in_image / keypoints via OKS heatmap decoding, the
        reference `object_detection.py:118-175` protocol).
        `use_teacher=True` scores the teacher anchor instead (reference
        tests it too unless -student_only)."""
        from ..models.detection.rcnn import KeypointRCNN, MaskRCNN
        from ..utils.coco_eval import keypoints_from_heatmaps, paste_mask
        module = self.teacher_module if use_teacher else self.student_module
        model_variables = self.teacher_variables if use_teacher \
            else self.student_variables
        iou_types = self.iou_types if runtime is None else ['bbox']
        evaluators = {t: CocoEvaluator(iou_type=t) for t in iou_types}
        want_masks = 'segm' in iou_types and isinstance(module, MaskRCNN)
        want_kps = 'keypoints' in iou_types and \
            isinstance(module, KeypointRCNN)
        fn_key = 'teacher' if use_teacher else 'student'
        if runtime is None and self._eval_fn.get(fn_key) is None:
            def fwd(variables, x):
                out = module.apply(
                    variables, x, mode='finetune', train=False)
                dets = postprocess_detections(out)
                extras = {}
                feats = [f for f in out['features'][:4]]
                if want_masks:
                    extras['mask_probs'] = jax.vmap(
                        lambda fi, bi, li: module.apply(
                            variables, fi, bi, li,
                            method=lambda m, f, b, lb: m.predict_masks(
                                f, b, lb, out['image_hw'])))(
                        feats, dets['boxes'], dets['labels'])
                if want_kps:
                    extras['kp_heatmaps'] = jax.vmap(
                        lambda fi, bi: module.apply(
                            variables, fi, bi,
                            method=lambda m, f, b: m.predict_keypoints(
                                f, b, out['image_hw'])))(
                        feats, dets['boxes'])
                return dets, extras
            self._eval_fn[fn_key] = jax.jit(fwd)
        meter = MetricLogger()
        import time

        def record(dets, targets, scales, origs=None, extras=None):
            for i, target in enumerate(targets):
                for ev in evaluators.values():
                    ev.add_gt(target)
                valid = np.asarray(dets['valid'][i])
                boxes = np.asarray(dets['boxes'][i])[valid] / scales[i]
                pred = {
                    'boxes': boxes,
                    'scores': np.asarray(dets['scores'][i])[valid],
                    'labels': np.asarray(dets['labels'][i])[valid]}
                if extras and 'mask_probs' in extras:
                    oh, ow = origs[i]
                    probs = np.asarray(extras['mask_probs'][i])[valid]
                    pred['masks'] = [paste_mask(p, b, oh, ow)
                                     for p, b in zip(probs, boxes)]
                if extras and 'kp_heatmaps' in extras:
                    hm = np.asarray(extras['kp_heatmaps'][i])[valid]
                    pred['keypoints'] = keypoints_from_heatmaps(hm, boxes)
                for ev in evaluators.values():
                    ev.update({target['image_id']: pred})

        if runtime is not None:
            # pipelined deploy: stream 16-batch chunks through the runtime
            # (encodes overlap host entropy coding; per-sample byte
            # accounting unchanged)
            chunk = []

            use_device_wire = self.config.get('deploy_wire') == 'device'

            def drain():
                if not chunk:
                    return
                t0 = time.time()
                if use_device_wire:
                    results = runtime.stream_detect_device(
                        [b for b, _, _ in chunk])
                else:
                    results = runtime.stream_detect(
                        [b for b, _, _ in chunk])
                dt = (time.time() - t0) / len(chunk)
                for dets, (_, targets, scales) in zip(results, chunk):
                    meter.update(model_time=dt)
                    record(dets, targets, scales)
                chunk.clear()

            for images, targets in data_loader:
                batch, scales, _ = self.transform(list(images))
                chunk.append((batch, targets, scales))
                if len(chunk) == 16:
                    drain()
            drain()
        else:
            local_vars = localized(model_variables)  # once, not per batch
            for images, targets in data_loader:
                batch, scales, origs = self.transform(list(images))
                t0 = time.time()
                dets, extras = self._eval_fn[fn_key](
                    local_vars, jnp.asarray(batch))
                meter.update(model_time=time.time() - t0)
                record(dets, targets, scales, origs, extras)
        for ev in evaluators.values():
            ev.synchronize_between_processes()
            ev.accumulate()
        primary = 'bbox' if 'bbox' in evaluators else iou_types[0]
        stats = evaluators[primary].summarize()
        for t, ev in evaluators.items():
            if t != primary:
                stats[t] = ev.summarize()
        logger.info('detection eval: mAP %.4f AP50 %.4f', stats['AP'],
                    stats['AP50'])
        return stats

    def train(self, dst_ckpt=None):
        if self.wrapper is not None:
            raise ValueError('input-compression detection configs are '
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
            box = DetectionBox(
                self.student_module, self.student_variables, stage_cfg,
                teacher_module=self.teacher_module,
                teacher_variables=self.teacher_variables,
                steps_per_epoch=max(len(train_loader), 1),
                student_mode='finetune' if self.bottleneck_updated
                else 'train', mesh=self.mesh,
                detection_loss_weight=float(
                    stage_cfg.get('detection_loss_weight', 0.0)))
            epoch_to_update = stage_cfg.get('epoch_to_update')
            if epoch_to_update == 0 and not self.bottleneck_updated:
                self.bottleneck_updated = True
                box.student_mode = 'finetune'
            for epoch in range(int(stage_cfg.get('num_epochs', 1))):
                meter = MetricLogger()
                acc = MetricAccumulator(meter, nan_check_interval)
                for images, targets in train_loader:
                    batch, padded, _ = self._prepare_batch(images, targets)
                    rng, srng = jax.random.split(rng)
                    metrics = box.train_step(batch, padded, srng)
                    acc.push(sum(jax.tree.leaves(metrics['loss'])),
                             metrics['aux_loss'])
                acc.drain()
                self.student_variables = box.student_variables
                stats = self.evaluate(val_loader)
                if stats['AP'] > best:
                    best = stats['AP']
                    if dst_ckpt:
                        save_ckpt(dst_ckpt, self.student_variables,
                                  meta={'best_map': best})
                logger.info('epoch %d: %s (best mAP %.4f)', epoch,
                            str(meter), best)
        return best

    def _test_wrapper(self, loader):
        """Eval through the input-compression wrapper: its transform
        compresses each image before the detector (reference
        `InputCompressionDetectionModel`, SURVEY.md §3.3)."""
        if hasattr(self.wrapper, 'activate_analysis'):
            self.wrapper.activate_analysis()
        evaluator = CocoEvaluator()
        for images, targets in loader:
            results = self.wrapper(list(images))
            for target, res in zip(targets, results):
                evaluator.add_gt(target)
                evaluator.update({target['image_id']: res})
        evaluator.synchronize_between_processes()
        evaluator.accumulate()
        stats = evaluator.summarize()
        if hasattr(self.wrapper, 'summarize'):
            stats['data_size'] = self.wrapper.summarize()
        logger.info('wrapper detection eval: mAP %.4f', stats['AP'])
        return stats

    def test(self):
        """Deploy-path test: real bitstream + data-size analysis when the
        model has an entropy bottleneck (reference protocol, batch 1)."""
        test_config = self.config.get('test', {})
        loader = self.build_loader(test_config['test_data_loader'])
        if self.wrapper is not None:
            return self._test_wrapper(loader)
        runtime = None
        try:
            from ..models.detection.wrapper import SplitDetectionRuntime
            runtime = SplitDetectionRuntime(
                self.student_module, localized(self.student_variables))
            runtime.update()
            runtime.activate_analysis()
        except (KeyError, AttributeError, TypeError):
            runtime = None  # no entropy bottleneck in this model
        stats = self.evaluate(loader, runtime=runtime)
        if runtime is not None:
            summaries = runtime.summarize()
            for s in summaries:
                logger.info('analysis: %s', s)
            stats['data_size'] = summaries
        return stats
