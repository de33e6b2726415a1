"""Host-side data pipelines.

The reference uses torchvision/torchdistill datasets with multi-worker
PyTorch loaders (SURVEY.md §2.1). TPU-native equivalent: simple host loaders
with a background-thread prefetcher feeding `device_put` — the TPU's input
pipeline is host CPU → HBM, no worker process pool required at these image
rates. ImageFolder layout matches ILSVRC-2012 (`train/<wnid>/*.JPEG`);
synthetic datasets back tests and benchmarks where no data is mounted.
"""
from __future__ import annotations

import queue
import threading
from pathlib import Path

import numpy as np

from ..registry import register_dataset

IMG_EXTENSIONS = {'.jpg', '.jpeg', '.png', '.ppm', '.bmp', '.webp'}


@register_dataset
class ImageFolderDataset:
    """ImageNet-style directory dataset: root/<class>/<image>."""

    def __init__(self, root, transform=None, **kwargs):
        self.root = Path(root)
        self.transform = transform
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [
            (p, self.class_to_idx[c]) for c in classes
            for p in sorted((self.root / c).iterdir())
            if p.suffix.lower() in IMG_EXTENSIONS]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        from PIL import Image
        path, target = self.samples[idx]
        img = Image.open(path).convert('RGB')
        if self.transform is not None:
            img = self.transform(img)
        return img, target


@register_dataset
class SyntheticClassificationDataset:
    """Deterministic random images for tests/benchmarks (no data mounted)."""

    def __init__(self, num_samples=64, image_size=(224, 224),
                 num_classes=1000, seed=0, normalized=True, **kwargs):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.seed = seed
        self.normalized = normalized

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        h, w = self.image_size
        if self.normalized:
            img = rng.normal(0, 1, (h, w, 3)).astype(np.float32)
        else:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        target = int(rng.integers(0, self.num_classes))
        return img, target


class DataLoader:
    """Minimal batched loader with optional shuffle, a background prefetch
    thread, and optional threaded item fetch (`num_workers` > 0) — PIL's
    JPEG decode and file IO release the GIL, so a small pool parallelizes
    the decode path on multi-core hosts (the reference's dataloader-worker
    equivalent, `image_classification.py:28`)."""

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 collate_fn=None, seed=0, prefetch=True, num_workers=0,
                 num_shards=1, shard_index=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or self._default_collate
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = num_workers
        # Multi-process data parallelism (the reference's DistributedSampler
        # contract): every process shuffles the full index set with the SAME
        # seed+epoch, pads it by wrapping to a multiple of `num_shards`, and
        # takes the `shard_index`-strided slice — disjoint, equally-sized
        # per-process shards that together cover the dataset.
        if not (0 <= shard_index < num_shards):
            raise ValueError(f'shard_index {shard_index} not in '
                             f'[0, {num_shards})')
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._pool = None
        self.epoch = 0

    @staticmethod
    def _default_collate(batch):
        xs, ys = zip(*batch)
        arrs = [np.asarray(x) for x in xs]
        if all(a.dtype == np.uint8 for a in arrs):
            # preserve uint8: the deploy runtimes normalize on device
            # (input_norm) and the wire cost is 1/4 of float32
            x = np.stack(arrs)
        else:
            x = np.stack([a.astype(np.float32) for a in arrs])
        return x, np.asarray(ys, np.int64)

    def _shard_len(self):
        return -(-len(self.dataset) // self.num_shards) \
            if self.num_shards > 1 else len(self.dataset)

    def __len__(self):
        n = self._shard_len()
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            total = self._shard_len() * self.num_shards
            if total > len(idx):  # pad by wrapping (DistributedSampler)
                idx = np.concatenate([idx, idx[:total - len(idx)]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def _fetch(self, chunk):
        if self.num_workers > 0:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(self.num_workers)
            return list(self._pool.map(
                lambda i: self.dataset[int(i)], chunk))
        return [self.dataset[int(i)] for i in chunk]

    def close(self):
        """Release the worker pool (threads otherwise live until exit)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _batches(self):
        idx = self._indices()
        bs = self.batch_size
        end = len(idx) - (len(idx) % bs) if self.drop_last else len(idx)
        for start in range(0, end, bs):
            yield self.collate_fn(self._fetch(idx[start:start + bs]))
        self.epoch += 1

    def __iter__(self):
        if not self.prefetch:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def build_sharded_loader(split_config, collate_fn=None,
                         shard_over_processes=False, **overrides):
    """DataLoader from a split config, optionally sharded per host process
    (the reference's DistributedSampler contract, SURVEY.md §2.4): with
    `shard_over_processes=True` each process iterates a disjoint dataset
    shard; batches are further sharded over the process's local devices by
    the training box. Single-process runs are unaffected. Shared by the
    three task engines so the sharding contract cannot drift per task."""
    import jax
    dataset = build_dataset(split_config['dataset'])
    num_shards = jax.process_count() if shard_over_processes else 1
    kwargs = dict(batch_size=split_config.get('batch_size', 1),
                  shuffle=split_config.get('shuffle', False),
                  drop_last=split_config.get('drop_last', False),
                  num_workers=split_config.get('num_workers', 0),
                  num_shards=num_shards,
                  shard_index=jax.process_index() if num_shards > 1 else 0)
    if collate_fn is not None:
        kwargs['collate_fn'] = collate_fn
    kwargs.update(overrides)
    return DataLoader(dataset, **kwargs)


def build_dataset(dataset_config):
    """Instantiate a dataset from config via the registry (the reference's
    YAML `!import_call` equivalent, SURVEY.md §5.6)."""
    from ..registry import get as registry_get
    key = dataset_config.get('key', dataset_config.get('type'))
    return registry_get('dataset', key)(**dataset_config.get('kwargs', {}))
