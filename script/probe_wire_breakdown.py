"""Probe: attribute the fused device-wire programs' time at wire_batch=64.

Times, on the live chip (bf16-decode runtime):
  enc_convs  — encoder conv+GDN+quantize only (symbols out, no rANS)
  enc_full   — full fused encode program (convs + rANS encode + meta)
  dec_convs  — decoder+tail from raw symbols (no rANS decode)
  dec_full   — full fused decode program (rANS decode + decoder + tail)
The deltas are the device rANS coding cost inside each program.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_runtime, device_loop_rate, force
from sc2bench_tpu.models.backbone import SplittableResNet
from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
from sc2bench_tpu.models.runtime import SplitClassifierRuntime

K = 64


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
    rt = SplitClassifierRuntime(model, variables, deploy_bf16_decode=True)
    rt.update()
    rt.eval()
    grp = [images[i % len(images)] for i in range(K)]
    xs = jnp.stack(grp)
    med = rt._medians_dev
    cdf, cdf_len, off = rt._device_tables()

    # ---- encoder convs only ----
    def enc_convs(variables, medians, xs):
        def one(x):
            return rt.module.apply(
                variables, rt._prep_input(x), medians,
                method=lambda m, xx, mm:
                    m.bottleneck_layer.encode_ops(xx, mm))['symbols']
        return jax.vmap(one)(xs)

    f_ec = jax.jit(enc_convs)
    syms = f_ec(rt.variables, med, xs)
    force(syms)
    r_ec = device_loop_rate(lambda: f_ec(rt.variables, med, xs), n=50) * K

    # ---- full encode ----
    ops = rt.encode_device_wire_batch(grp)
    enc_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'encode_devwire_b{K}_'))
    enc = rt._jit_cache[enc_key]
    enc_args = (rt.variables, med, cdf, cdf_len, off, xs)
    r_ef = device_loop_rate(lambda: enc(*enc_args), n=50) * K

    # ---- decoder+tail from symbols (no rANS) ----
    module = rt._decode_module()
    sym1 = np.asarray(jax.device_get(syms))
    h, w, c = ops['shape']

    def dec_convs(variables, medians, sym):
        def one(s):
            def m_fn(m, ss, mm):
                feat = m.bottleneck_layer.decode_ops(ss, mm)
                return m.forward_tail(feat)
            return module.apply(variables, ss_fix(s), medians,
                                method=m_fn).astype(jnp.float32)
        return jax.vmap(one)(sym)

    def ss_fix(s):
        return s.reshape(1, h, w, c)

    f_dc = jax.jit(dec_convs)
    sflat = jnp.asarray(sym1.reshape(K, -1))
    lg = f_dc(rt.variables, med, sflat)
    force(lg)
    r_dc = device_loop_rate(lambda: f_dc(rt.variables, med, sflat),
                            n=50) * K

    # ---- full decode ----
    logits, valid = rt.decode_device_streams_batch(
        ops['streams'], ops['states'], ops['shape'])
    force(logits)
    assert bool(np.asarray(valid).all())
    dec_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'decode_devwire_b{K}_'))
    dec = rt._jit_cache[dec_key]
    dec_args = (rt.variables, ops['streams'], ops['states'], med,
                cdf, cdf_len, off)
    r_df = device_loop_rate(lambda: dec(*dec_args), n=50) * K

    us = lambda r: 1e6 / r  # noqa: E731
    print(f'enc_convs {r_ec:8.0f} img/s ({us(r_ec):6.1f} us/img)')
    print(f'enc_full  {r_ef:8.0f} img/s ({us(r_ef):6.1f} us/img)  '
          f'rans_enc ~{us(r_ef) - us(r_ec):6.1f} us/img')
    print(f'dec_convs {r_dc:8.0f} img/s ({us(r_dc):6.1f} us/img)')
    print(f'dec_full  {r_df:8.0f} img/s ({us(r_df):6.1f} us/img)  '
          f'rans_dec ~{us(r_df) - us(r_dc):6.1f} us/img')


if __name__ == '__main__':
    t0 = time.perf_counter()
    main()
    print(f'total {time.perf_counter() - t0:.0f}s')
