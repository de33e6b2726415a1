"""Thread-safe numpy RNG for data transforms.

`np.random.Generator` is not thread-safe; `DataLoader(num_workers > 0)`
fetches items (and therefore runs the random transforms) from a thread
pool. `ThreadLocalRng` hands each thread an independent child generator
spawned from one `SeedSequence`, so augmentation draws are both valid and
seed-reproducible per thread.
"""
from __future__ import annotations

import threading

import numpy as np


class ThreadLocalRng:
    """Duck-types a `np.random.Generator`; each thread lazily gets its own
    child generator spawned from the seed sequence.

    Reproducibility caveat: children are handed out in first-touch order,
    so *which* thread gets which child depends on scheduling — draws are
    valid and independent per thread, but a multi-threaded run is only
    reproducible as a set, not per item."""

    def __init__(self, seed=None):
        self._seq = np.random.SeedSequence(seed)
        self._local = threading.local()
        self._spawn_lock = threading.Lock()

    def _rng(self) -> np.random.Generator:
        rng = getattr(self._local, 'rng', None)
        if rng is None:
            with self._spawn_lock:
                child = self._seq.spawn(1)[0]
            rng = np.random.default_rng(child)
            self._local.rng = rng
        return rng

    def __getattr__(self, name):
        if name.startswith('_'):
            # never proxy private/dunder lookups: during unpickling or
            # deepcopy, __setstate__/_local are probed before __dict__ is
            # restored — proxying would recurse via self._local forever
            raise AttributeError(name)
        return getattr(self._rng(), name)
