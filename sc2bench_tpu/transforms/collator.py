"""Batch collation for segmentation (pad-to-max) and detection.

Parity surface of `/root/reference/sc2bench/transforms/collator.py` and
`script/task/custom/collator.py`. TPU addition: `pad_to` buckets let the
collator emit *static* shapes so jit does not recompile per batch.
"""
from __future__ import annotations

import numpy as np

from ..registry import register_collate


def cat_list(images, fill_value=0, pad_to=None):
    """Stack HWC arrays padded to the max (or bucketed) size
    (reference `collator.py:5-26`)."""
    max_h = max(img.shape[0] for img in images)
    max_w = max(img.shape[1] for img in images)
    if pad_to is not None:
        max_h = -(-max_h // pad_to) * pad_to
        max_w = -(-max_w // pad_to) * pad_to
    if images[0].ndim == 3:
        shape = (len(images), max_h, max_w, images[0].shape[2])
    else:
        shape = (len(images), max_h, max_w)
    out = np.full(shape, fill_value, dtype=images[0].dtype)
    for i, img in enumerate(images):
        out[i, :img.shape[0], :img.shape[1]] = img
    return out


@register_collate
def pascal_seg_collate_fn(batch, pad_to=None):
    """Images fill 0, targets fill 255 (ignore index)
    (reference `collator.py:29-42`)."""
    images, targets = zip(*[(np.asarray(s), np.asarray(t)) for s, t in batch])
    return (cat_list(images, 0, pad_to),
            cat_list(targets, 255, pad_to).astype(np.int32))


@register_collate
def pascal_seg_eval_collate_fn(batch):
    """Eval-time: keep per-sample arrays (batch size 1 protocol)
    (reference `collator.py:45-57`)."""
    images, targets = zip(*batch)
    return list(images), list(targets)


@register_collate
def coco_collate_fn(batch):
    """tuple(zip(*batch)) (reference `custom/collator.py:7`)."""
    return tuple(zip(*batch))
