"""PASCAL VOC 2012 segmentation dataset (host-side).

Equivalent of the torchvision `VOCSegmentation` the reference configures via
YAML `!import_call` (SURVEY.md §2.3): JPEGImages + SegmentationClass PNG
masks, 21 classes, 255 = ignore. Paired transforms follow
`/root/reference/script/task/custom/transform.py` (random resize/crop/flip
on image+target together).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..registry import register_dataset


@register_dataset
class VOCSegmentationDataset:
    def __init__(self, root, image_set='train', transforms=None, **kwargs):
        root = Path(root)
        base = root / 'VOCdevkit' / 'VOC2012' \
            if (root / 'VOCdevkit').exists() else root
        split_file = base / 'ImageSets' / 'Segmentation' / f'{image_set}.txt'
        names = split_file.read_text().split()
        self.images = [base / 'JPEGImages' / f'{n}.jpg' for n in names]
        self.masks = [base / 'SegmentationClass' / f'{n}.png' for n in names]
        self.transforms = transforms

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        from PIL import Image
        img = np.asarray(Image.open(self.images[idx]).convert('RGB'))
        target = np.asarray(Image.open(self.masks[idx]), np.int32)
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target


@register_dataset
class SyntheticSegmentationDataset:
    """Random images + masks for tests/benchmarks."""

    def __init__(self, num_samples=8, image_size=(64, 64), num_classes=21,
                 seed=0, **kwargs):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        h, w = self.image_size
        img = rng.normal(0, 1, (h, w, 3)).astype(np.float32)
        target = rng.integers(0, self.num_classes, (h, w)).astype(np.int32)
        return img, target


class PairedSegTransforms:
    """Random resize / crop / hflip applied to (image, target) together
    (reference `custom/transform.py:49-127`); normalization on image only."""

    def __init__(self, base_size=520, crop_size=480, hflip_prob=0.5,
                 mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 train=True, seed=0, jpeg_quality=None):
        self.base_size = base_size
        self.crop_size = crop_size
        self.hflip_prob = hflip_prob
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.train = train
        from ..utils.rngtools import ThreadLocalRng
        self.rng = ThreadLocalRng(seed)  # thread-safe: loaders may fetch
        # items from a num_workers pool
        # optional JPEG pre-degradation after resize (reference
        # CustomRandomResize, custom/transform.py:49-71)
        self.jpeg_quality = jpeg_quality

    def __call__(self, img, target):
        from PIL import Image
        pil = Image.fromarray(np.asarray(img, np.uint8))
        tgt = Image.fromarray(np.asarray(target).astype(np.uint8))
        if self.train:
            scale = self.rng.uniform(0.5, 2.0)
            size = int(self.base_size * scale)
        else:
            size = self.base_size
        w, h = pil.size
        if w < h:
            nw, nh = size, int(size * h / w)
        else:
            nw, nh = int(size * w / h), size
        pil = pil.resize((nw, nh), Image.BILINEAR)
        tgt = tgt.resize((nw, nh), Image.NEAREST)
        if self.jpeg_quality is not None:
            import io
            buf = io.BytesIO()
            pil.save(buf, format='JPEG', quality=self.jpeg_quality)
            buf.seek(0)
            pil = Image.open(buf).convert('RGB')
        if self.train:
            # pad if needed then random crop
            pw = max(self.crop_size - nw, 0)
            ph = max(self.crop_size - nh, 0)
            if pw or ph:
                img_arr = np.zeros((nh + ph, nw + pw, 3), np.uint8)
                img_arr[:nh, :nw] = np.asarray(pil)
                tgt_arr = np.full((nh + ph, nw + pw), 255, np.uint8)
                tgt_arr[:nh, :nw] = np.asarray(tgt)
            else:
                img_arr = np.asarray(pil)
                tgt_arr = np.asarray(tgt)
            y0 = int(self.rng.integers(
                0, img_arr.shape[0] - self.crop_size + 1))
            x0 = int(self.rng.integers(
                0, img_arr.shape[1] - self.crop_size + 1))
            img_arr = img_arr[y0:y0 + self.crop_size, x0:x0 + self.crop_size]
            tgt_arr = tgt_arr[y0:y0 + self.crop_size, x0:x0 + self.crop_size]
            if self.rng.uniform() < self.hflip_prob:
                img_arr = img_arr[:, ::-1]
                tgt_arr = tgt_arr[:, ::-1]
        else:
            img_arr = np.asarray(pil)
            tgt_arr = np.asarray(tgt)
        img_out = (img_arr.astype(np.float32) / 255.0 - self.mean) / self.std
        return img_out, tgt_arr.astype(np.int32)
