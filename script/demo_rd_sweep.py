#!/usr/bin/env python
"""Rate-distortion sweep demo: the benchmark's core tradeoff, end to end.

Trains the flagship Entropic Student bottleneck (FPBasedResNetBottleneck,
stage-1 hint-MSE + beta*bpp objective against a frozen random teacher
feature map — the reference recipe's shape, SURVEY.md §2.3) at three beta
operating points on synthetic data, then `update()`s the coding tables and
measures REAL per-image bitstream bytes at batch 1. Prints a 3-point R-D
table demonstrating the monotone rate/distortion tradeoff the benchmark
sweeps exist to measure (reference `script/task/README.md:39-46`).

Run ad hoc:  python script/demo_rd_sweep.py [steps]
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
import optax  # noqa: E402


def run_point(beta, steps, seed=0):
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    from sc2bench_tpu.train.box import factorized_aux_loss

    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                                 num_target_channels=64),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((8, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(seed), 'noise': jax.random.key(seed + 1)},
        x0)
    params = variables['params']
    bstats = variables.get('batch_stats', {})

    # frozen "teacher layer1" target: a fixed random projection of the input
    tkey = jax.random.key(42)
    tproj = jax.random.normal(tkey, (3, 64)) * 0.2

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(p):
            out, state = model.apply(
                {'params': p, 'batch_stats': bstats}, x,
                method=lambda m, v: m.bottleneck_layer(v, mode='train'),
                rngs={'noise': rng}, mutable=['entropy'])
            (_, lik), = state['entropy']['bottleneck_layer']['eb_out']
            n_pix = x.shape[0] * x.shape[1] * x.shape[2]
            bpp = -jnp.sum(jnp.log2(lik)) / n_pix
            target = jax.image.resize(
                x @ tproj, out.shape, 'bilinear')
            mse = jnp.mean((out - target) ** 2)
            return mse + beta * bpp + 1e-3 * factorized_aux_loss(p), \
                (mse, bpp)
        (_, (mse, bpp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, mse, bpp

    rng = np.random.default_rng(seed)
    for i in range(steps):
        x = jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)
        srng = jax.random.key(1000 + i)
        params, opt_state, mse, bpp = step(params, opt_state, x, srng)

    # deploy: real bitstream bytes at batch 1 (the benchmark's data-size
    # metric, reference README.md:99-103)
    rt = SplitClassifierRuntime(model, {'params': params,
                                        'batch_stats': bstats})
    rt.update()
    rt.eval()
    rt.activate_analysis()
    for i in range(4):
        img = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)), jnp.float32)
        rt(img)
    kb = rt.summarize()[0]['mean']
    return float(mse), float(bpp), float(kb)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    betas = [0.01, 1.0, 10.0]
    print(f'# R-D sweep: {steps} stage-1 steps per beta, synthetic data')
    print(f'{"beta":>8} {"train MSE":>12} {"train bpp":>10} '
          f'{"deploy KB/img":>14}')
    rows = []
    t0 = time.time()
    for beta in betas:
        mse, bpp, kb = run_point(beta, steps)
        rows.append((beta, mse, bpp, kb))
        print(f'{beta:>8} {mse:>12.4f} {bpp:>10.3f} {kb:>14.3f}')
    print(f'# {time.time() - t0:.0f}s total')
    # the benchmark contract: higher beta => lower rate, higher distortion
    kbs = [r[3] for r in rows]
    mses = [r[1] for r in rows]
    assert kbs[0] > kbs[-1], 'rate must fall as beta rises'
    assert mses[0] < mses[-1], 'distortion must rise as beta rises'
    print('# monotone R-D tradeoff confirmed')


if __name__ == '__main__':
    main()
