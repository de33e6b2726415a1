"""Probe: does a bfloat16 encoder lift the k=128 fused encode program?

The device-wire encode program runs the encoder convs in f32 so the
bitstreams stay byte-identical to the reference-semantics coder
(symbol rounding happens right after the encoder). A bf16 encoder
(convs on the MXU at bf16 rate, rounding still f32 — the layer's
documented dtype semantics, models/layer.py FPBasedResNetBottleneck)
produces *slightly different but equally valid* bitstreams. This probe
measures (a) the encode-program device rate f32 vs bf16 at
wire_batch=128, (b) symbol drift and wire-size drift, to decide
whether an opt-in deploy_bf16_encode mode is worth shipping.

Run on the TPU: `python script/probe_bf16_encode.py`
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_runtime, device_loop_rate, force  # noqa: E402


def main(k=128):
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.normal(0, 1, (1, 224, 224, 3)), jnp.float32)
            for _ in range(8)]
    grp = [imgs[i % len(imgs)] for i in range(k)]

    rt = build_runtime(deploy_bf16_decode=True)
    ops = rt.encode_device_wire_batch(grp)
    force(ops['meta'])
    key = next(s for s in rt._jit_cache
               if str(s).startswith(f'encode_devwire_b{k}_'))
    enc = rt._jit_cache[key]
    cdf, cdf_len, off = rt._device_tables()
    args = (rt.variables, rt._medians_dev, cdf, cdf_len, off,
            jnp.stack(grp))
    r_f32 = device_loop_rate(lambda: enc(*args), n=100) * k
    meta_f32 = np.asarray(ops['meta'])

    # bf16-encoder runtime over the SAME weights (the opt-in product
    # mode, runtime.deploy_bf16_encode)
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    rt16 = SplitClassifierRuntime(rt.module, rt.variables,
                                  deploy_bf16_decode=True,
                                  deploy_bf16_encode=True)
    rt16.update()
    rt16.eval()
    ops16 = rt16.encode_device_wire_batch(grp)
    force(ops16['meta'])
    key16 = next(s for s in rt16._jit_cache
                 if str(s).startswith(f'encode_devwire_b{k}_'))
    enc16 = rt16._jit_cache[key16]
    c16, cl16, o16 = rt16._device_tables()
    args16 = (rt16.variables, rt16._medians_dev, c16, cl16, o16,
              jnp.stack(grp))
    r_bf16 = device_loop_rate(lambda: enc16(*args16), n=100) * k
    meta_bf16 = np.asarray(ops16['meta'])

    # symbol drift on one image (each runtime's ENCODE module)
    def syms(r, x):
        mod = r._encode_module()
        return np.asarray(r._jitted('probe_syms', lambda v, x, m: mod.apply(
            v, r._prep_input(x), m,
            method=lambda mm, xx, md: mm.bottleneck_layer.encode_ops(xx, md))[
                'symbols'])(r.variables, x, r._medians_dev))
    a = syms(rt, grp[0]).astype(np.int64)
    b = syms(rt16, grp[0]).astype(np.int64)
    drift = float((a != b).mean())

    print(f'k={k} encode img/s: f32 {r_f32:.0f}  bf16 {r_bf16:.0f} '
          f'({r_bf16 / r_f32:.2f}x)')
    print(f'wire bytes/group: f32 {meta_f32[:, 1].sum()} '
          f'bf16 {meta_bf16[:, 1].sum()} '
          f'({meta_bf16[:, 1].sum() / meta_f32[:, 1].sum():.4f}x)')
    print(f'symbol drift: {drift:.5%} of latent elements')
    # pair-rate projection with the measured bf16 decode rate
    dec_key = next((s for s in rt._jit_cache
                    if str(s).startswith(f'decode_devwire_b{k}_')), None)
    if dec_key is None:
        logits, _ = rt.decode_device_streams_batch(
            ops['streams'], ops['states'], ops['shape'])
        force(logits)
        dec_key = next(s for s in rt._jit_cache
                       if str(s).startswith(f'decode_devwire_b{k}_'))
    dec = rt._jit_cache[dec_key]
    dargs = (rt.variables, ops['streams'], ops['states'],
             rt._medians_dev, cdf, cdf_len, off)
    r_dec = device_loop_rate(lambda: dec(*dargs), n=100) * k
    pair_f32 = 1 / (1 / r_f32 + 1 / r_dec)
    pair_bf16 = 1 / (1 / r_bf16 + 1 / r_dec)
    print(f'decode img/s: {r_dec:.0f}; pair: f32-enc {pair_f32:.0f} '
          f'bf16-enc {pair_bf16:.0f} ({pair_bf16 / pair_f32:.2f}x)')


if __name__ == '__main__':
    main()
