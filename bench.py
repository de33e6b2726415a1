#!/usr/bin/env python
"""Benchmark: batch-1 deploy-path throughput of the flagship model
(Entropic Student ResNet-50 + factorized-prior bottleneck, 224x224), the
reference's north-star hot loop (SURVEY.md §3.2):

    encoder conv+GDN (TPU) -> quantize -> rANS encode (host C++)
    -> rANS decode -> decoder IGDN (TPU) -> ResNet-50 tail -> logits

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference pipeline runs the same loop as GPU convs +
CompressAI's single-stream C++ rANS on CPU at batch 1
(`sc2bench/models/layer.py:496-521`). With the published protocol
(README.md:99-108) the wall clock is dominated by the CPU entropy coder and
per-sample Python overhead; BASELINE_IPS below is an engineering estimate of
that pipeline's images/sec (v0.0.3-era GPU + CPU coder), pending a measured
reference run (BASELINE.json `published` is empty — the repo publishes no
throughput numbers).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IPS = 25.0  # estimated reference batch-1 deploy-path images/sec


def main():
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime

    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=24),
        stage_sizes=(3, 4, 6, 3), num_classes=1000)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)},
        x, mode='train')
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, variables)
    rt.update()
    rt.eval()

    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.normal(0, 1, (1, 224, 224, 3)), jnp.float32)
              for _ in range(8)]

    # warmup (compile both programs + host coder)
    logits = rt(images[0])
    jax.block_until_ready(logits)

    n_iter = 50
    t0 = time.perf_counter()
    for i in range(n_iter):
        logits = rt(images[i % len(images)])
    jax.block_until_ready(logits)
    elapsed = time.perf_counter() - t0
    ips = n_iter / elapsed

    print(json.dumps({
        'metric': 'deploy_images_per_sec_batch1',
        'value': round(ips, 2),
        'unit': 'images/sec',
        'vs_baseline': round(ips / BASELINE_IPS, 2),
    }))


if __name__ == '__main__':
    main()
