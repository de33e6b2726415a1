"""Aspect-ratio-grouped batch sampling for detection.

Parity surface of `/root/reference/script/task/custom/sampler.py:21-197`
(`GroupedBatchSampler` + `create_aspect_ratio_groups`): batches draw from one
aspect-ratio bucket so the padded canvas wastes less, which on TPU also means
fewer distinct static shapes → fewer recompilations.
"""
from __future__ import annotations

import bisect
from collections import defaultdict

import numpy as np


def create_aspect_ratio_groups(aspect_ratios, k: int = 0):
    """Quantize aspect ratios into 2k+1 log-spaced buckets (reference
    `sampler.py:180-197`)."""
    bins = (2 ** np.linspace(-1, 1, 2 * k + 1)).tolist() if k > 0 else [1.0]
    groups = [bisect.bisect_right(bins, ar) for ar in aspect_ratios]
    return groups


def compute_aspect_ratios(dataset):
    """Per-sample w/h. Fast paths: dataset-provided metadata, else load."""
    if hasattr(dataset, 'get_height_and_width'):
        return [w / h for h, w in
                (dataset.get_height_and_width(i)
                 for i in range(len(dataset)))]
    if hasattr(dataset, 'coco'):
        return [dataset.coco.imgs[i]['width'] / dataset.coco.imgs[i]['height']
                for i in dataset.ids]
    ratios = []
    for i in range(len(dataset)):
        img, _ = dataset[i]
        h, w = np.asarray(img).shape[:2]
        ratios.append(w / h)
    return ratios


class GroupedBatchSampler:
    """Yields lists of indices where each batch comes from one group
    (reference `sampler.py:21-82`); leftover samples are batched with
    same-group repeats so every element is visited once per epoch."""

    def __init__(self, group_ids, batch_size, shuffle=True, seed=0):
        self.group_ids = np.asarray(group_ids)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __iter__(self):
        order = np.arange(len(self.group_ids))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        buffers = defaultdict(list)
        for idx in order:
            g = self.group_ids[idx]
            buffers[g].append(int(idx))
            if len(buffers[g]) == self.batch_size:
                yield buffers[g]
                buffers[g] = []
        # flush leftovers, padding from the same group's already-seen items
        for g, buf in buffers.items():
            if buf:
                pool = [int(i) for i in np.where(self.group_ids == g)[0]]
                while len(buf) < self.batch_size:
                    buf.append(pool[len(buf) % len(pool)])
                yield buf
        self.epoch += 1

    def __len__(self):
        counts = np.bincount(self.group_ids)
        return int(sum(-(-c // self.batch_size) for c in counts if c))
