"""COCO-format detection dataset (host-side, pure Python/numpy).

Parity surface of `/root/reference/script/task/coco/dataset.py` (which wraps
pycocotools — a C extension not present in this image): parses COCO
instances JSON, filters images without annotations, converts (x, y, w, h)
boxes to (x1, y1, x2, y2), and returns per-image target dicts. Polygon→mask
conversion is implemented in numpy for the segmentation-style targets.
"""
from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from ..registry import register_dataset


class CocoIndex:
    """Minimal pycocotools.COCO equivalent over an instances JSON."""

    def __init__(self, annotation_path):
        with open(annotation_path) as f:
            self.dataset = json.load(f)
        self.imgs = {img['id']: img for img in self.dataset.get('images', [])}
        self.cats = {c['id']: c for c in self.dataset.get('categories', [])}
        self.img_to_anns = defaultdict(list)
        self.anns = {}
        for ann in self.dataset.get('annotations', []):
            self.img_to_anns[ann['image_id']].append(ann)
            self.anns[ann['id']] = ann

    def get_img_ids(self):
        return sorted(self.imgs)

    def load_anns_for_img(self, img_id):
        return self.img_to_anns.get(img_id, [])


@register_dataset
class CocoDetectionDataset:
    """root/<images>, annotation JSON; returns (image HWC float[0,1],
    target dict with 'boxes' xyxy, 'labels', 'image_id', 'area',
    'iscrowd')."""

    def __init__(self, img_dir, ann_file_path, remove_non_annotated_imgs=True,
                 transforms=None, **kwargs):
        self.img_dir = Path(img_dir)
        self.coco = CocoIndex(ann_file_path)
        self.transforms = transforms
        ids = self.coco.get_img_ids()
        if remove_non_annotated_imgs:
            ids = [i for i in ids if len(self.coco.load_anns_for_img(i)) > 0]
        self.ids = ids

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx):
        from PIL import Image
        img_id = self.ids[idx]
        info = self.coco.imgs[img_id]
        img = Image.open(self.img_dir / info['file_name']).convert('RGB')
        anns = [a for a in self.coco.load_anns_for_img(img_id)]
        boxes, labels, areas, iscrowd = [], [], [], []
        for a in anns:
            x, y, w, h = a['bbox']
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            labels.append(a['category_id'])
            areas.append(a.get('area', w * h))
            iscrowd.append(a.get('iscrowd', 0))
        target = {
            'boxes': np.asarray(boxes, np.float32).reshape(-1, 4),
            'labels': np.asarray(labels, np.int32),
            'area': np.asarray(areas, np.float32),
            'iscrowd': np.asarray(iscrowd, np.int32),
            'image_id': img_id,
        }
        sample = np.asarray(img, np.uint8)
        if self.transforms is not None:
            sample, target = self.transforms(sample, target)
        return sample, target


@register_dataset
class SyntheticDetectionDataset:
    """Random images + boxes for tests/benchmarks."""

    def __init__(self, num_samples=16, image_size=(128, 128), max_boxes=5,
                 num_classes=91, seed=0, **kwargs):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.max_boxes = max_boxes
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        h, w = self.image_size
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        n = int(rng.integers(1, self.max_boxes + 1))
        x1 = rng.uniform(0, w * 0.6, n)
        y1 = rng.uniform(0, h * 0.6, n)
        bw = rng.uniform(w * 0.1, w * 0.4, n)
        bh = rng.uniform(h * 0.1, h * 0.4, n)
        boxes = np.stack([x1, y1, np.minimum(x1 + bw, w),
                          np.minimum(y1 + bh, h)], 1).astype(np.float32)
        target = {
            'boxes': boxes,
            'labels': rng.integers(1, self.num_classes, n).astype(np.int32),
            'area': ((boxes[:, 2] - boxes[:, 0])
                     * (boxes[:, 3] - boxes[:, 1])).astype(np.float32),
            'iscrowd': np.zeros(n, np.int32),
            'image_id': idx,
        }
        return img, target


def rasterize_polygon(polygons, height: int, width: int) -> np.ndarray:
    """COCO polygon segmentation -> binary mask, pure-numpy even-odd
    scanline fill (replaces pycocotools `frPyObjects`/`decode`, reference
    `script/task/coco/dataset.py:89-94`). `polygons`: list of flat
    [x0, y0, x1, y1, ...] rings."""
    mask = np.zeros((height, width), bool)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(pts) < 3:
            continue
        xs, ys = pts[:, 0], pts[:, 1]
        y_grid = np.arange(height) + 0.5
        ring = np.zeros((height, width), bool)
        for y_i, y in enumerate(y_grid):
            x1s, y1s = xs, ys
            x2s = np.roll(xs, -1)
            y2s = np.roll(ys, -1)
            crosses = ((y1s <= y) & (y2s > y)) | ((y2s <= y) & (y1s > y))
            if not crosses.any():
                continue
            with np.errstate(divide='ignore', invalid='ignore'):
                x_int = x1s + (y - y1s) / (y2s - y1s) * (x2s - x1s)
            x_cross = np.sort(x_int[crosses])
            for a, b in zip(x_cross[0::2], x_cross[1::2]):
                lo = max(int(np.ceil(a - 0.5)), 0)
                hi = min(int(np.ceil(b - 0.5)), width)
                if hi > lo:
                    ring[y_i, lo:hi] = True
        mask |= ring
    return mask


def pad_detection_targets(targets, max_boxes: int):
    """Pad a list of target dicts to static (N, max_boxes, ...) arrays for
    jit-compiled training (SURVEY.md §7: fixed-size padded candidate sets)."""
    n = len(targets)
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.zeros((n, max_boxes), np.int32)
    valid = np.zeros((n, max_boxes), bool)
    for i, t in enumerate(targets):
        k = min(len(t['boxes']), max_boxes)
        boxes[i, :k] = t['boxes'][:k]
        labels[i, :k] = t['labels'][:k]
        valid[i, :k] = True
    return {'boxes': boxes, 'labels': labels, 'boxes_valid': valid}
