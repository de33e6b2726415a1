"""Probe: per-stage timing of the FP encoder at batch 64, f32.

Also tests space-to-depth restructurings of the two 5x5/s2 convs:
  s2d(2)(x) conv 3x3 s1 == conv 5x5 s2 (weights rearranged, bit-exact
  modulo f32 summation order), trading a 3-channel 224^2 conv for a
  12-channel 112^2 one (4x the K dim on the MXU).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_loop_rate, force

K = 64


def timeit(fn, *args, n=50):
    out = fn(*args)
    force(out)
    r = device_loop_rate(lambda: fn(*args), n=n) * K
    return 1e6 / r  # us/img


def conv(x, w, stride=1, pad=2):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def s2d(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def gdn(x, gamma, beta):
    nrm = jnp.einsum('nhwc,cd->nhwd', jnp.abs(x), gamma) + beta
    return x / nrm


def main():
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)  # noqa: E731
    x = f(K, 224, 224, 3)
    w0 = f(5, 5, 3, 96)
    g0, b0 = jnp.abs(f(96, 96)) * 0.1, jnp.abs(f(96)) + 1.0
    w1 = f(5, 5, 96, 48)
    g1, b1 = jnp.abs(f(48, 48)) * 0.1, jnp.abs(f(48)) + 1.0
    w2 = f(2, 2, 48, 24)

    j = jax.jit
    c0 = j(lambda x, w: conv(x, w, 2, 2))
    y0 = c0(x, w0)                                   # (K,112,112,96)
    t_c0 = timeit(c0, x, w0)
    gd0 = j(gdn)
    t_g0 = timeit(gd0, y0, g0, b0)
    y0g = gd0(y0, g0, b0)
    c1 = j(lambda x, w: conv(x, w, 2, 2))
    t_c1 = timeit(c1, y0g, w1)
    y1 = c1(y0g, w1)                                 # (K,56,56,48)
    gd1 = j(gdn)
    t_g1 = timeit(gd1, y1, g1, b1)
    y1g = gd1(y1, g1, b1)
    c2 = j(lambda x, w: conv(x, w, 1, 0))
    t_c2 = timeit(c2, y1g, w2)
    y2 = c2(y1g, w2)                                 # (K,55,55,24)
    rnd = j(lambda y: jnp.round(y).astype(jnp.int32))
    t_r = timeit(rnd, y2)

    # fused whole encoder, one jit
    def enc(x, w0, g0, b0, w1, g1, b1, w2):
        y = conv(x, w0, 2, 2)
        y = gdn(y, g0, b0)
        y = conv(y, w1, 2, 2)
        y = gdn(y, g1, b1)
        y = conv(y, w2, 1, 0)
        return jnp.round(y).astype(jnp.int32)
    encj = j(enc)
    t_all = timeit(encj, x, w0, g0, b0, w1, g1, b1, w2)

    print(f'conv0(3->96,5x5s2@224) {t_c0:6.1f} us/img')
    print(f'gdn0(96@112)           {t_g0:6.1f} us/img')
    print(f'conv1(96->48,5x5s2)    {t_c1:6.1f} us/img')
    print(f'gdn1(48@56)            {t_g1:6.1f} us/img')
    print(f'conv2(48->24,2x2)      {t_c2:6.1f} us/img')
    print(f'round                  {t_r:6.1f} us/img')
    print(f'sum                    '
          f'{t_c0 + t_g0 + t_c1 + t_g1 + t_c2 + t_r:6.1f} us/img')
    print(f'fused encoder          {t_all:6.1f} us/img')

    # --- space-to-depth variants --------------------------------------
    # conv 5x5 s2 pad 2 == s2d then conv 3x3 s1 with rearranged weights:
    # out(i,j) = sum_{di,dj} x(2i+di-2, 2j+dj-2) w(di,dj). With s2d input
    # u(i,j)[a,b,c] = x(2i+a, 2j+b, c), di-2 = 2p+a => taps map into a
    # 3x3 (p,q) window over u with channel (a,b). 5x5 needs p in {-1,0,1}.
    def w_s2d(w):   # (5,5,I,O) -> (3,3,4I,O)
        k, _, ci, co = w.shape
        out = np.zeros((3, 3, 4 * ci, co), np.float32)
        for di in range(5):
            for dj in range(5):
                # x index 2i+di-2 = 2(i+p)+a with a in {0,1}
                p, a = divmod(di - 2 + 2, 2)     # p in {0,1,2}-1
                q, b = divmod(dj - 2 + 2, 2)
                out[p, q, (a * 2 + b) * ci:(a * 2 + b) * ci + ci] += \
                    np.asarray(w[di, dj])
        return jnp.asarray(out)

    w0s = w_s2d(w0)
    c0s = j(lambda x, w: conv(s2d(x), w, 1, 1))
    y0s = c0s(x, w0s)
    err = float(jnp.max(jnp.abs(y0s - y0)))
    t_c0s = timeit(c0s, x, w0s)
    print(f'conv0 via s2d          {t_c0s:6.1f} us/img  (max err {err:.2e})')

    w1s = w_s2d(w1)
    c1s = j(lambda x, w: conv(s2d(x), w, 1, 1))
    y1s = c1s(y0g, w1s)
    err1 = float(jnp.max(jnp.abs(y1s - y1)))
    t_c1s = timeit(c1s, y0g, w1s)
    print(f'conv1 via s2d          {t_c1s:6.1f} us/img  (max err {err1:.2e})')

    # fused encoder with s2d convs
    def enc_s(x, w0, g0, b0, w1, g1, b1, w2):
        y = conv(s2d(x), w0, 1, 1)
        y = gdn(y, g0, b0)
        y = conv(s2d(y), w1, 1, 1)
        y = gdn(y, g1, b1)
        y = conv(y, w2, 1, 0)
        return jnp.round(y).astype(jnp.int32)
    encs = j(enc_s)
    ys = encs(x, w0s, g0, b0, w1s, g1, b1, w2)
    errs = float(jnp.max(jnp.abs(ys - encj(
        x, w0, g0, b0, w1, g1, b1, w2))))
    t_alls = timeit(encs, x, w0s, g0, b0, w1s, g1, b1, w2)
    print(f'fused encoder s2d      {t_alls:6.1f} us/img  '
          f'(max sym err {errs:.0f})')

    # bf16 upper bound (diagnostic only; changes bits)
    encb = j(lambda *a: enc(a[0].astype(jnp.bfloat16),
                            *[t.astype(jnp.bfloat16) for t in a[1:]]))
    t_b = timeit(encb, x, w0, g0, b0, w1, g1, b1, w2)
    print(f'fused encoder bf16     {t_b:6.1f} us/img  (diagnostic)')


if __name__ == '__main__':
    t0 = time.perf_counter()
    main()
    print(f'total {time.perf_counter() - t0:.0f}s')
