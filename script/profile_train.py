#!/usr/bin/env python
"""Ablation profile of the stage-1 distillation train step.

Times each compiled slice of the step on the live backend so the MFU gap
(bench.py `train_mfu_vs_bf16_peak`) can be attributed to a component:

  teacher_fwd     teacher ResNet50 forward alone (no grad)
  student_fwd     student forward alone (train mode, sown io_dict)
  grad_no_bpp     fwd+bwd with the BppLoss term removed (no entropy
                  likelihood in the graph -> XLA DCEs the density model)
  grad_full       fwd+bwd with the full criterion (no optimizer update)
  full_step       DistillationBox.train_step (grad + masked update + aux)
  density_eval    the factorized likelihood alone over the bottleneck
                  tensor shape, fwd and fwd+bwd

Run ad hoc:  python script/profile_train.py [batch] [image] [steps]
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


def _force(x):
    """True execution barrier (the tunneled backend's block_until_ready
    resolves without waiting): dependent 8-elem reduction fetched to host."""
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8]))


def _time(fn, *args, steps=8, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, **kw)
    _force(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def _flops(fn, *args, **kw):
    try:
        c = jax.jit(fn).lower(*args, **kw).compile()
        return c.cost_analysis()['flops']
    except Exception:
        return float('nan')


def main(batch=128, image=224, steps=8):
    from bench_train import build
    box, x = build(jnp.bfloat16, batch, image)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.key(0)

    peak = 197e12  # v5e bf16
    rows = []

    def add(name, ms, fl):
        rows.append((name, ms, fl))
        mfu = fl / (ms * 1e-3) / peak if fl == fl else float('nan')
        print(f'{name:14s} {ms:8.2f} ms   {fl / 1e9:9.1f} GFLOP   '
              f'MFU {mfu * 100:5.1f}%')

    # teacher forward
    tvars = box.teacher_variables
    teacher = box.teacher_module
    t_fwd = jax.jit(lambda v, x: teacher.apply(v, x, train=False))
    add('teacher_fwd', _time(t_fwd, tvars, xr, steps=steps),
        _flops(lambda v, x: teacher.apply(v, x, train=False), tvars, xr))

    # student forward (train mode)
    svars = {'params': box.state.params,
             'batch_stats': box.state.batch_stats}
    student = box.student_module
    s_fwd = jax.jit(lambda v, x, k: student.apply(
        v, x, mode='train', rngs={'noise': k}))
    add('student_fwd', _time(s_fwd, svars, xr, key, steps=steps),
        _flops(lambda v, x, k: student.apply(
            v, x, mode='train', rngs={'noise': k}), svars, xr, key))

    # full train step
    try:
        c = box._train_step.lower(box.state, xr, y, key,
                                  student_mode='train').compile()
        fl_step = c.cost_analysis()['flops']
    except Exception:
        fl_step = float('nan')

    def one_step():
        box.train_step(xr, y, key)
        return box.state.params
    add('full_step', _time(one_step, steps=steps), fl_step)

    # measured backward slice: grad of the FULL criterion wrt student
    # params with the teacher io precomputed (constant device arrays), so
    # grad_full - student_fwd isolates the backward pass itself (VJP convs
    # + loss epilogue), free of teacher fwd and optimizer update
    from sc2bench_tpu.train.box import factorized_aux_loss, flatten_io
    tio = jax.jit(box._teacher_io)(xr)

    def loss_fn(params, x, k, teacher_io):
        params = jax.tree.map(
            lambda p, label: jax.lax.stop_gradient(p)
            if label == 'frozen' else p, params, box.labels)
        variables = {'params': params, 'batch_stats': box.state.batch_stats}
        s_out, s_state = student.apply(
            variables, x, mode='train', train=box.train_bn,
            rngs={'noise': k}, mutable=['intermediates', 'entropy'])
        io = flatten_io(s_state.get('intermediates', {}))
        io.update(flatten_io(s_state.get('entropy', {})))
        io['output'] = s_out
        main_loss, _ = box.criterion(io, teacher_io, y)
        return main_loss + factorized_aux_loss(params)

    grad_full = jax.jit(jax.grad(loss_fn))
    add('grad_full', _time(grad_full, box.state.params, xr, key, tio,
                           steps=steps),
        _flops(jax.grad(loss_fn), box.state.params, xr, key, tio))
    bwd_ms = rows[-1][1] - rows[1][1]
    bwd_fl = rows[-1][2] - rows[1][2]
    print(f'  -> backward slice (grad_full - student_fwd): {bwd_ms:.2f} ms'
          f'   {bwd_fl / 1e9:9.1f} GFLOP   '
          f'MFU {bwd_fl / (bwd_ms * 1e-3) / peak * 100:5.1f}%')

    # density model alone at the bottleneck tensor shape
    from sc2bench_tpu.ops.entropy.factorized import EntropyBottleneck
    cb, hb, wb = 24, image // 4, image // 4
    eb = EntropyBottleneck(channels=cb)
    yb = jnp.asarray(rng.normal(0, 3, (batch, hb, wb, cb)), jnp.float32)
    ev = jax.jit(lambda v, x, k: eb.apply(v, x, rngs={'noise': k}))
    evars = eb.init({'params': key, 'noise': key}, yb)
    add('density_fwd', _time(ev, evars, yb, key, steps=steps),
        _flops(lambda v, x, k: eb.apply(v, x, rngs={'noise': k}),
               evars, yb, key))

    def dens_loss(v, x, k):
        _, lk = eb.apply(v, x, rngs={'noise': k})
        return jnp.sum(jnp.log(lk))

    dgrad = jax.jit(jax.grad(dens_loss))
    add('density_bwd', _time(dgrad, evars, yb, key, steps=steps),
        _flops(jax.grad(dens_loss), evars, yb, key))

    tot = rows[0][1] + rows[1][1]
    print(f'\nteacher+student fwd = {tot:.2f} ms; '
          f'full step = {rows[2][1]:.2f} ms; '
          f'bwd+update overhead = {rows[2][1] - tot:.2f} ms')


if __name__ == '__main__':
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    im = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    st = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(b, im, st)
