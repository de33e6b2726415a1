#!/usr/bin/env python
"""Rate-distortion sweep: the benchmark's core tradeoff, as a recorded
per-round artifact.

Trains an Entropic Student bottleneck (FP factorized-prior or MSHP
mean-scale hyperprior) at three beta operating points with the stage-1
hint-MSE + beta*bpp objective against a frozen random teacher feature
map (the reference recipe's shape, SURVEY.md §2.3) on synthetic data,
then `update()`s the coding tables and measures REAL per-image bitstream
bytes at batch 1 — the closest offline stand-in for the reference's
operating-point grids (`/root/reference/script/task/README.md:39-46`)
in an environment with no ImageNet mount or released checkpoints.

    python script/rd_sweep.py [steps] [--out RD_rNN.json]

Emits a JSON record per family asserting the benchmark contract:
higher beta => lower rate (deploy KB/img), higher distortion (MSE).
The slow-tier CI test (`tests/test_rd_sweep.py`) re-runs a short sweep
and asserts the same monotonicity; `RD_r05.json` at the repo root is
the committed full-length artifact.
"""
import json
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


def _bottleneck(family):
    from sc2bench_tpu.models.layer import (FPBasedResNetBottleneck,
                                           MSHPBasedResNetBottleneck)
    if family == 'fp':
        return FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                       num_target_channels=64)
    if family == 'mshp':
        return MSHPBasedResNetBottleneck(num_bottleneck_channels=8,
                                         num_latent_channels=8,
                                         num_target_channels=64)
    raise ValueError(family)


def run_point(family, beta, steps, seed=0):
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    from sc2bench_tpu.train.box import factorized_aux_loss

    model = SplittableResNet(bottleneck_layer=_bottleneck(family),
                             stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((8, 64, 64, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(seed), 'noise': jax.random.key(seed + 1)},
        x0)
    params = variables['params']
    bstats = variables.get('batch_stats', {})

    # frozen "teacher layer1" target: a fixed random projection of the input
    tproj = jax.random.normal(jax.random.key(42), (3, 64)) * 0.2

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(p):
            out, state = model.apply(
                {'params': p, 'batch_stats': bstats}, x,
                method=lambda m, v: m.bottleneck_layer(v, mode='train'),
                rngs={'noise': rng}, mutable=['entropy'])
            ent = state['entropy']['bottleneck_layer']
            # total bpp over every sown likelihood tensor (FP: eb_out;
            # SHP/MSHP: eb_out for z + gc_out for y — the reference's
            # BppLoss reads the same io_dict entries)
            n_pix = x.shape[0] * x.shape[1] * x.shape[2]
            bpp = 0.0
            for key in ent:
                (_, lik), = ent[key]
                bpp = bpp - jnp.sum(jnp.log2(lik)) / n_pix
            target = jax.image.resize(x @ tproj, out.shape, 'bilinear')
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
        params, opt_state, mse, bpp = step(params, opt_state, x,
                                           jax.random.key(1000 + i))

    # deploy: real bitstream bytes at batch 1 (the benchmark's data-size
    # metric, reference README.md:99-103)
    rt = SplitClassifierRuntime(model, {'params': params,
                                        'batch_stats': bstats})
    rt.update()
    rt.eval()
    rt.activate_analysis()
    for _ in range(4):
        img = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)), jnp.float32)
        rt(img)
    kb = rt.summarize()[0]['mean']
    return float(mse), float(bpp), float(kb)


def sweep(family, steps, betas=(0.003, 0.1, 3.0)):
    print(f'# {family} R-D sweep: {steps} stage-1 steps per beta')
    print(f'{"beta":>8} {"train MSE":>12} {"train bpp":>10} '
          f'{"deploy KB/img":>14}')
    points = []
    for beta in betas:
        mse, bpp, kb = run_point(family, beta, steps)
        points.append({'beta': beta, 'train_mse': round(mse, 6),
                       'train_bpp': round(bpp, 4),
                       'deploy_kb_per_img': round(kb, 4)})
        print(f'{beta:>8} {mse:>12.4f} {bpp:>10.3f} {kb:>14.3f}')
    assert_monotone(points, family)
    print(f'# {family}: monotone R-D tradeoff confirmed')
    return {'family': family, 'steps': steps, 'points': points}


def assert_monotone(points, label=''):
    """The benchmark contract: as beta rises, the rate (deploy KB/img)
    falls and the distortion (train MSE) rises — non-strict per step
    (high betas can saturate at the wire-overhead floor), strict across
    the endpoints."""
    kbs = [p['deploy_kb_per_img'] for p in points]
    mses = [p['train_mse'] for p in points]
    assert all(a >= b for a, b in zip(kbs, kbs[1:])), (label, kbs)
    assert all(a <= b for a, b in zip(mses, mses[1:])), (label, mses)
    assert kbs[0] > kbs[-1], (label, kbs)
    assert mses[0] < mses[-1], (label, mses)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    steps = int(args[0]) if args else 800
    out = None
    for a in sys.argv[1:]:
        if a.startswith('--out='):
            out = a.split('=', 1)[1]
    t0 = time.time()
    record = {'steps': steps,
              'families': [sweep('fp', steps), sweep('mshp', steps)],
              'betas': [0.003, 0.1, 3.0],
              'protocol': 'stage-1 hint-MSE + beta*bpp, synthetic data, '
                          'batch-1 deploy byte accounting'}
    print(f'# {time.time() - t0:.0f}s total')
    if out:
        Path(out).write_text(json.dumps(record, indent=1) + '\n')
        print(f'# wrote {out}')


if __name__ == '__main__':
    main()
