#!/usr/bin/env python
"""SHP/MSHP batched device-wire rates (the hyperprior serving programs).

The y-stream decode uses the GENERAL per-symbol-index rANS path against
the (64, ~3.2k) Gaussian tables; r5 switched its symbol search from
full-row gathers to fixed-depth bisection (ops/rans/device.py). This
probe records the fused enc/dec device-loop rates at wire_batch=32.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sc2bench_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import device_loop_rate, force  # noqa: E402

K = 32


def main(kind='mshp'):
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import (MSHPBasedResNetBottleneck,
                                           SHPBasedResNetBottleneck)
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    cls = (MSHPBasedResNetBottleneck if kind == 'mshp'
           else SHPBasedResNetBottleneck)
    model = SplittableResNet(
        bottleneck_layer=cls(num_bottleneck_channels=24,
                             num_latent_channels=16),
        stage_sizes=(3, 4, 6, 3), num_classes=1000)
    x = jnp.zeros((1, 224, 224, 3))
    variables = jax.jit(lambda r, xx: model.init(r, xx, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, variables, deploy_bf16_decode=True)
    rt.update()
    rt.eval()
    rng = np.random.default_rng(0)
    grp = [jnp.asarray(rng.normal(0, 0.5, (1, 224, 224, 3)), jnp.float32)
           for _ in range(K)]
    ops = rt.encode_device_wire_hyper_batch(grp)
    ok = np.asarray(ops['meta'])[:, 0]
    logits, valid = rt.decode_device_streams_hyper_batch(ops)
    force(logits)
    print(f'{kind}: ok={int(ok.sum())}/{K} '
          f'valid={int(np.asarray(valid).sum())}/{K}')
    enc_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'enc_devwire_hyper_b{K}_'))
    dec_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'dec_devwire_hyper_b{K}_'))
    # re-dispatch through the public APIs (cached jits, same args)
    er = device_loop_rate(
        lambda: rt.encode_device_wire_hyper_batch(grp), n=50) * K
    dr = device_loop_rate(
        lambda: rt.decode_device_streams_hyper_batch(ops), n=50) * K
    pair = 1 / (1 / er + 1 / dr)
    print(f'{kind} wire_batch={K}: enc {er:7.0f} img/s  dec {dr:7.0f} '
          f'img/s  pair {pair:7.0f} img/s', flush=True)
    assert enc_key and dec_key


if __name__ == '__main__':
    t0 = time.perf_counter()
    for kind in (sys.argv[1:] or ['shp', 'mshp']):
        main(kind)
    print(f'total {time.perf_counter() - t0:.0f}s')
