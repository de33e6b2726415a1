"""Multi-chip batch-1 serving pool.

The reference's data-size protocol requires batch 1 *per device*
(`/root/reference/README.md:99-103`); its DataParallel eval shards a batch
across GPUs. The TPU-native serving analogue for a multi-chip host is a
pool of per-device deploy runtimes: images are round-robined across the
local devices, each running the split deploy pipeline (host-coder or
device-rANS wire) independently — per-image bitstreams, byte accounting,
and logits are identical to single-chip serving, and throughput scales
with the chip count because the streams share nothing but the host
dispatch thread pool.

Works with any runtime class exposing the `SplitClassifierRuntime`
surface (variables, update(), stream_deploy / stream_deploy_device).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax


class ServingPool:
    """`replicas[d]` is an independent runtime whose variables live on
    local device d. `stream(images)` preserves input order."""

    def __init__(self, runtime_factory, variables, devices=None,
                 wire: str = 'host'):
        """runtime_factory(variables) -> runtime (e.g.
        `lambda v: SplitClassifierRuntime(module, v)`); `variables` are
        copied to every device. wire: 'host' | 'device' (device-rANS)."""
        self.devices = list(devices or jax.local_devices())
        if not self.devices:
            raise ValueError('no local devices')
        self.wire = wire
        self.replicas = []
        for d in self.devices:
            rt = runtime_factory(jax.device_put(variables, d))
            rt.update()
            if hasattr(rt, 'eval'):
                rt.eval()
            self.replicas.append(rt)

    def activate_analysis(self):
        for rt in self.replicas:
            rt.activate_analysis()

    def summarize(self):
        """Pooled byte accounting: merge every replica's per-sample sizes
        (the analyzers are per-replica; the pool-level mean/std covers all
        served images)."""
        sizes = []
        unit = 'KB'
        for rt in self.replicas:
            for a in rt.analyzers:
                sizes.extend(a.file_size_list)
                unit = getattr(a, 'unit', unit)
        import numpy as np
        arr = np.asarray(sizes, np.float64)
        return {'mean': float(arr.mean()) if len(arr) else 0.0,
                'std': float(arr.std()) if len(arr) else 0.0,
                'num_samples': len(arr), 'unit': unit}

    def stream(self, images, depth: int = 8, workers: int = 4,
               wire_batch: int | None = None):
        """Round-robin the stream across devices; returns logits in input
        order. Each replica runs its own pipelined deploy concurrently.
        `wire_batch=k` (device wire only) groups k images per fused
        dispatch on each replica (per-image accounting unchanged)."""
        if wire_batch is not None and self.wire != 'device':
            raise ValueError('wire_batch grouping requires wire="device"')
        images = list(images)
        n = len(images)
        k = len(self.replicas)
        shards = [[] for _ in range(k)]
        positions = [[] for _ in range(k)]
        for i, img in enumerate(images):
            d = i % k
            # images must live on the replica's device: a committed input
            # on the wrong chip would drag the program there
            shards[d].append(jax.device_put(img, self.devices[d]))
            positions[d].append(i)

        def run(d):
            rt = self.replicas[d]
            if not shards[d]:
                return []
            if self.wire == 'device':
                return rt.stream_deploy_device(shards[d], depth=depth,
                                               workers=workers,
                                               wire_batch=wire_batch)
            return rt.stream_deploy(shards[d], depth=depth, workers=workers)

        results = [None] * n
        with ThreadPoolExecutor(k) as ex:
            for d, outs in zip(range(k), ex.map(run, range(k))):
                for pos, out in zip(positions[d], outs):
                    results[pos] = out
        return results
