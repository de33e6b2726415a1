"""Probe: f32 vs bf16-decode device-wire program rates at wire_batch=64.

Measures the fused encode+code and decode+tail device-loop rates on the
live chip for both runtimes; prints per-program rates and the pair MFU.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import (V5E_PEAK_BF16_FLOPS, build_runtime, device_loop_rate,
                   force, program_flops)
from sc2bench_tpu.models.backbone import SplittableResNet
from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
from sc2bench_tpu.models.runtime import SplitClassifierRuntime


def measure(rt, images, wire_batch=64):
    grp = [images[i % len(images)] for i in range(wire_batch)]
    ops = rt.encode_device_wire_batch(grp)
    enc_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'encode_devwire_b{wire_batch}_'))
    enc = rt._jit_cache[enc_key]
    cdf, cdf_len, off = rt._device_tables()
    enc_args = (rt.variables, rt._medians_dev, cdf, cdf_len, off,
                jnp.stack(grp))
    enc_flops = program_flops(enc, *enc_args)
    logits, valid = rt.decode_device_streams_batch(
        ops['streams'], ops['states'], ops['shape'])
    force(logits)
    assert bool(np.asarray(valid).all())
    dec_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'decode_devwire_b{wire_batch}_'))
    dec = rt._jit_cache[dec_key]
    dec_args = (rt.variables, ops['streams'], ops['states'],
                rt._medians_dev, cdf, cdf_len, off)
    dec_flops = program_flops(dec, *dec_args)
    enc_rate = device_loop_rate(lambda: enc(*enc_args), n=100) * wire_batch
    dec_rate = device_loop_rate(lambda: dec(*dec_args), n=100) * wire_batch
    pair = 1.0 / (1.0 / enc_rate + 1.0 / dec_rate)
    fpi = (enc_flops + dec_flops) / wire_batch
    return dict(enc_ips=round(enc_rate, 1), dec_ips=round(dec_rate, 1),
                pair_ips=round(pair, 1),
                mfu=round(fpi * pair / V5E_PEAK_BF16_FLOPS, 4),
                gflops_img=round(fpi / 1e9, 2),
                enc_gf=round(enc_flops / wire_batch / 1e9, 2),
                dec_gf=round(dec_flops / wire_batch / 1e9, 2))


def main():
    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=24),
        stage_sizes=(3, 4, 6, 3), num_classes=1000)
    x = jnp.zeros((1, 224, 224, 3))
    variables = jax.jit(lambda r, xx: model.init(r, xx, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x)
    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.normal(0, 1, (1, 224, 224, 3)), jnp.float32)
              for _ in range(8)]
    for name, kw in (('f32', {}), ('bf16dec', {'deploy_bf16_decode': True})):
        rt = SplitClassifierRuntime(model, variables, **kw)
        rt.update()
        rt.eval()
        t0 = time.perf_counter()
        out = measure(rt, images)
        print(name, out, f'({time.perf_counter() - t0:.0f}s incl compile)',
              flush=True)


if __name__ == '__main__':
    main()
