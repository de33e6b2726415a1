"""Segmentation evaluator: confusion matrix → global acc / per-class acc /
IoU / mIoU (parity with `/root/reference/script/task/utils/eval.py:4-41`).
Cross-process reduction via host allgather (the reference's
`dist.all_reduce`, SURVEY.md §5.8)."""
from __future__ import annotations

import numpy as np


class SegEvaluator:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, target, pred):
        """target/pred: int arrays (any shape); 255 = ignore."""
        t = np.asarray(target).ravel()
        p = np.asarray(pred).ravel()
        n = self.num_classes
        k = (t >= 0) & (t < n)
        inds = n * t[k].astype(np.int64) + p[k]
        self.mat += np.bincount(inds, minlength=n ** 2).reshape(n, n)

    def reset(self):
        self.mat[:] = 0

    def reduce_from_all_processes(self):
        import jax
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(self.mat)
        self.mat = np.asarray(gathered).sum(axis=0)

    def compute(self):
        h = self.mat.astype(np.float64)
        acc_global = np.diag(h).sum() / max(h.sum(), 1)
        acc = np.diag(h) / np.maximum(h.sum(1), 1)
        iou = np.diag(h) / np.maximum(h.sum(1) + h.sum(0) - np.diag(h), 1)
        return acc_global, acc, iou

    def __str__(self):
        acc_global, acc, iou = self.compute()
        return ('global correct: {:.1f}\naverage row correct: {}\n'
                'IoU: {}\nmean IoU: {:.1f}').format(
            acc_global * 100,
            [f'{i:.1f}' for i in (acc * 100).tolist()],
            [f'{i:.1f}' for i in (iou * 100).tolist()],
            iou.mean() * 100)
