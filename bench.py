#!/usr/bin/env python
"""Benchmark: batch-1 deploy-path throughput of the flagship model
(Entropic Student ResNet-50 + factorized-prior bottleneck, 224x224), the
reference's north-star hot loop (SURVEY.md §3.2):

    encoder conv+GDN (TPU) -> quantize -> rANS encode (host C++)
    -> rANS decode -> decoder IGDN (TPU) -> ResNet-50 tail -> logits

Each image is processed individually (the benchmark's batch-1 data-size
protocol, reference README.md:99-103); the stream is software-pipelined so
the TPU encode of image i+1 overlaps the host entropy coding of image i —
exactly how a production split-computing server runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs this loop as GPU convs + CompressAI's
single-stream C++ rANS on CPU at batch 1 (`sc2bench/models/layer.py:
496-521`). BASELINE_IPS is an engineering estimate of that pipeline's
images/sec (the repo publishes no throughput numbers — BASELINE.json
`published` is empty), pending a measured reference run.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sc2bench_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BASELINE_IPS = 25.0  # estimated reference batch-1 deploy-path images/sec


def main():
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime

    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=24),
        stage_sizes=(3, 4, 6, 3), num_classes=1000)
    x = jnp.zeros((1, 224, 224, 3))
    init_fn = jax.jit(lambda rngs, x: model.init(rngs, x, mode='train'))
    variables = init_fn(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, variables)
    rt.update()
    rt.eval()

    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.normal(0, 1, (1, 224, 224, 3)), jnp.float32)
              for _ in range(8)]

    # warmup: compile encode + decode programs, build host coder state
    logits = rt(images[0])
    jax.block_until_ready(logits)

    def run_pipelined(n_iter, depth=3):
        """Depth-3 software pipeline: encode dispatch + async device->host
        symbol copy for images i+1..i+depth overlap the host entropy coding
        and the decode dispatch of image i. One ~RTT-bound sync per image
        instead of three (the tunnel round trip is the floor here)."""
        def dispatch(i):
            ops = rt.encode_device(images[i % len(images)])
            try:
                ops['symbols'].copy_to_host_async()
            except Exception:
                pass
            return ops
        pending = [dispatch(i) for i in range(depth)]
        results = []
        t0 = time.perf_counter()
        for i in range(n_iter):
            ops = pending.pop(0)
            if i + depth < n_iter + depth - 1:
                pending.append(dispatch(i + depth))
            symbols = np.asarray(ops['symbols'])
            strings = rt.codec.compress_symbols(symbols)
            compressed = {'strings': [strings],
                          'shape': tuple(symbols.shape[1:3])}
            rt.analyze(compressed)
            results.append(rt.decode(**compressed))
        jax.block_until_ready(results[-1])
        return time.perf_counter() - t0

    rt.activate_analysis()
    run_pipelined(5)  # secondary warmup of the pipelined path
    n_iter = 100
    elapsed = run_pipelined(n_iter)
    ips = n_iter / elapsed

    print(json.dumps({
        'metric': 'deploy_images_per_sec_batch1',
        'value': round(ips, 2),
        'unit': 'images/sec',
        'vs_baseline': round(ips / BASELINE_IPS, 2),
    }))


if __name__ == '__main__':
    main()
