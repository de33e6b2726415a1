#!/usr/bin/env python
"""Benchmark: batch-1 deploy-path throughput of the flagship model
(Entropic Student ResNet-50 + factorized-prior bottleneck, 224x224), the
reference's north-star hot loop (SURVEY.md §3.2):

    encoder conv+GDN (TPU) -> quantize -> rANS encode (host C++)
    -> rANS decode -> decoder IGDN (TPU) -> ResNet-50 tail -> logits

Each image is processed individually (the benchmark's batch-1 data-size
protocol, reference README.md:99-103); the stream is software-pipelined
(`SplitClassifierRuntime.stream_deploy`): encodes for images i+1..i+depth
overlap the host entropy coding of image i, and a small thread pool overlaps
the per-image host syncs — exactly how a production split-computing server
runs. Symbols cross the host<->device boundary as int16 (lossless;
runtime._to_wire).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"value" is the MEDIAN of the fastest deploy mode with strictly BATCH-1
DISPATCH (named in "headline_mode" — the host-coder pipelined loop or
the per-image device-rANS wire, where entropy coding is fused
on-device); best-of-trials is kept as "best_ips". The host-coder loop —
the format-identical apples-to-apples number vs the torch baseline — is
always recorded as "host_coder_ips"; micro-batched modes (decode_batch=8
/ wire_batch=8/64, per-image bitstreams and accounting unchanged) are
informational fields, with "throughput_mode_*" recording the
chip-saturation serving numbers at wire_batch=128 (bf16-decode runtime +
aligned device-wire streams; per-image bitstreams byte-identical to the
f32 batch-1 wire).
Also recorded:
  - trials + per-mode medians: the remote-TPU tunnel's load varies
    by 2-3x between minutes; the median is the typical number, max the
    least-noisy sustained estimate
  - serving_mode_ips_decode_batch8: best of 3 (fused decoder+tail over 8
    consecutive images; per-image bitstreams/accounting unchanged)
  - device_wire_rans_ips / device_wire_batch8_ips: device-rANS wire mode
    (entropy coding fused on-device), per-image and 8-image-grouped
    dispatches (grouping keeps per-image bitstreams/accounting)
  - fresh_upload_uint8_ips: unique uint8 images per iteration through the
    device-side input_norm path (the 4x-smaller-upload serving mode)
  - device FLOPs + MFU: XLA cost-analysis FLOPs of the deploy programs and
    the bf16 train step, with measured device-loop rates, as a fraction of
    the v5e bf16 MXU peak (197 TFLOP/s)
  - train_step_img_per_sec: full distillation train step (teacher fwd +
    student fwd/bwd + masked update), bf16 tails, batch 128 @ 224

Baseline: the measured reference pipeline — the same architecture run as
torch CPU convs + single-stream C++ rANS at batch 1 on this host
(`script/bench_reference.py`, stored in BASELINE.json under `measured`).
The reference itself targets CUDA GPUs and publishes no throughput numbers
(BASELINE.json `published` is empty).
"""
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sc2bench_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

FALLBACK_BASELINE_IPS = 4.64  # measured 2026-08-16 (script/bench_reference.py)
V5E_PEAK_BF16_FLOPS = 197e12  # v5e MXU peak (bf16); f32 programs are
#                               reported against the same peak (conservative)


def measured_baseline_ips():
    try:
        data = json.loads((Path(__file__).parent / 'BASELINE.json').read_text())
        return float(data['measured']['torch_cpu_deploy_ips_batch1']['value'])
    except (FileNotFoundError, KeyError, ValueError):
        return FALLBACK_BASELINE_IPS


def program_flops(jitted, *args, **kwargs):
    """XLA cost-analysis FLOPs of one call of a jitted program."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost['flops'])
    except Exception:
        return float('nan')


def force(x):
    """Force execution of everything `x` depends on and return when it has
    actually run. On the tunneled (axon) backend `jax.block_until_ready`
    resolves without waiting for execution, so timings synced with it
    measure dispatch, not compute (measured: 20 in-flight 8k bf16 matmuls
    "complete" in 0.5 ms under block_until_ready; 150 ms when truly
    forced). A dependent 8-element reduction fetched to host (4 bytes over
    the tunnel) is the cheapest true barrier; single-device in-order
    execution makes the last output a barrier for the whole loop."""
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8]))


def device_loop_rate(dispatch, n=30):
    """Calls/sec with all dispatches in flight and ONE final sync — the
    device-throughput estimate least polluted by per-call tunnel latency."""
    force(dispatch())  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = dispatch()
    force(out)
    return n / (time.perf_counter() - t0)


def build_runtime(input_norm=None, deploy_bf16_decode=False,
                  deploy_bf16_encode=False):
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
    rt = SplitClassifierRuntime(model, variables, input_norm=input_norm,
                                deploy_bf16_decode=deploy_bf16_decode,
                                deploy_bf16_encode=deploy_bf16_encode)
    rt.update()
    rt.eval()
    return rt


def bench_deploy(rt, images, n_iter=120, n_trials=5):
    rt.stream_deploy([images[i % len(images)] for i in range(10)])  # warm
    trials, best_timings = [], {}
    for _ in range(n_trials):
        stream = [images[i % len(images)] for i in range(n_iter)]
        timings = {}
        t0 = time.perf_counter()
        results = rt.stream_deploy(stream, depth=16, workers=8,
                                   timings=timings)
        assert len(results) == n_iter
        trials.append(n_iter / (time.perf_counter() - t0))
        if trials[-1] == max(trials):
            best_timings = timings
    return trials, best_timings


def bench_serving(rt, images, n_iter=120, n_trials=3):
    rt.stream_deploy([images[i % len(images)] for i in range(16)],
                     decode_batch=8)  # warm the fused decode program
    trials = []
    for _ in range(n_trials):
        stream = [images[i % len(images)] for i in range(n_iter)]
        t0 = time.perf_counter()
        rt.stream_deploy(stream, depth=16, workers=8, decode_batch=8)
        trials.append(n_iter / (time.perf_counter() - t0))
    return trials


def bench_device_wire(rt, images, n_iter=120, n_trials=3,
                      wire_batch=None):
    """Device-rANS wire mode: entropy coding fused into the encode
    program, decode from device-resident streams — the per-image host
    interaction is an 8-byte meta, async-copied and harvested after the
    stream drains (ops/rans/device.py, models/runtime.py). With
    `wire_batch=k`, k images share each fused dispatch (per-image
    bitstreams/accounting unchanged; the batched programs run ~1.7x
    faster per image on-device)."""
    rt.stream_deploy_device([images[i % len(images)] for i in range(16)],
                            wire_batch=wire_batch)
    trials = []
    for _ in range(n_trials):
        stream = [images[i % len(images)] for i in range(n_iter)]
        t0 = time.perf_counter()
        rt.stream_deploy_device(stream, depth=16, workers=8,
                                wire_batch=wire_batch)
        trials.append(n_iter / (time.perf_counter() - t0))
    return trials


def bench_fresh_upload(n_iter=96):
    """Unique uint8 image per iteration through device-side input_norm:
    measures the real host->device upload path a serving frontend sees
    (the cached-8-image loops above never re-upload)."""
    rt = build_runtime(input_norm=((0.485, 0.456, 0.406),
                                   (0.229, 0.224, 0.225)))
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (1, 224, 224, 3), dtype=np.uint8)
              for _ in range(n_iter)]
    rt.stream_deploy([jnp.asarray(frames[0])])  # warm/compile
    t0 = time.perf_counter()
    rt.stream_deploy([jnp.asarray(f) for f in frames], depth=16, workers=8)
    return n_iter / (time.perf_counter() - t0)


def bench_device_programs(rt, image):
    """Deploy-program FLOPs (XLA cost analysis) + device-loop rates."""
    ops = rt.encode_device(image)
    enc = rt._jit_cache['encode']
    enc_flops = program_flops(enc, rt.variables, image, rt._medians_dev)
    sym = jnp.asarray(np.asarray(ops['symbols']))
    dec = rt._jit_cache.get('decode')
    if dec is None:
        rt._decode_call(sym)
        dec = rt._jit_cache['decode']
    dec_flops = program_flops(dec, rt.variables, sym, rt._medians_dev)
    enc_rate = device_loop_rate(
        lambda: enc(rt.variables, image, rt._medians_dev))
    dec_rate = device_loop_rate(lambda: dec(rt.variables, sym,
                                            rt._medians_dev))
    # one image = one encode + one decode, devices back-to-back
    pair_rate = 1.0 / (1.0 / enc_rate + 1.0 / dec_rate)
    mfu = (enc_flops + dec_flops) * pair_rate / V5E_PEAK_BF16_FLOPS
    return {
        'deploy_program_gflops_per_image':
            round((enc_flops + dec_flops) / 1e9, 2),
        'deploy_device_ips': round(pair_rate, 1),
        'deploy_device_mfu_vs_bf16_peak': round(mfu, 4),
    }


def fused_pair_stats(rt, images, wire_batch):
    """Device-loop rate (img/s) and GFLOP/image of the fused
    encode+code and decode+tail program pair at this group size —
    the chip-saturation number, free of tunnel latency. n=100:
    shorter loops carry a ~30 ms queue-warmup artifact on the
    tunneled runtime (measured: n=10 understates these rates ~25%)."""
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
    dec_key = next(k for k in rt._jit_cache
                   if str(k).startswith(f'decode_devwire_b{wire_batch}_'))
    dec = rt._jit_cache[dec_key]
    dec_args = (rt.variables, ops['streams'], ops['states'],
                rt._medians_dev, cdf, cdf_len, off)
    dec_flops = program_flops(dec, *dec_args)
    enc_rate = device_loop_rate(lambda: enc(*enc_args), n=100) * wire_batch
    dec_rate = device_loop_rate(lambda: dec(*dec_args), n=100) * wire_batch
    pair_rate = 1.0 / (1.0 / enc_rate + 1.0 / dec_rate)
    return pair_rate, (enc_flops + dec_flops) / wire_batch


def bench_throughput_mode(rt, images, wire_batch=128, n_iter=512,
                          n_trials=3):
    """Throughput-mode serving: the device-rANS wire grouped `wire_batch`
    images per fused dispatch (per-image bitstreams + byte accounting
    unchanged — the batch-1 protocol constrains *measurement*, not
    serving, reference README.md:99-103). Records end-to-end images/sec
    plus the device-loop rate/MFU of the fused encode+code and
    decode+tail programs at this group size (the chip-saturation
    number, free of tunnel latency). `rt` should be the bf16-decode
    runtime (byte-identical bitstreams, bf16 decoder+tail — see
    test_device_rans.py bf16 byte-identity tests); the streams use the
    ALIGNED layout (compaction-free kernels, identical wire bytes)."""
    rt.stream_deploy_device([images[i % len(images)]
                             for i in range(wire_batch * 2)],
                            wire_batch=wire_batch)  # warm/compile
    trials = []
    for _ in range(n_trials):
        stream = [images[i % len(images)] for i in range(n_iter)]
        t0 = time.perf_counter()
        # depth 16: the loop is host-dispatch-marshaling-bound on this
        # tunnel (~135 ms/group of GIL-serialized arg marshaling,
        # script/probe_e2e_budget.py); deeper pipelining hides more of
        # the device time under it (714 -> ~1,050 img/s measured)
        rt.stream_deploy_device(stream, depth=16, workers=8,
                                wire_batch=wire_batch)
        trials.append(n_iter / (time.perf_counter() - t0))

    # device-loop rates of the fused batched programs (one dispatch = k
    # images), decoupled from the host/tunnel: this is the MFU claim.
    pair_rate, flops_per_img = fused_pair_stats(rt, images, wire_batch)
    return {
        'throughput_mode_wire_batch': wire_batch,
        'throughput_mode_ips': round(max(trials), 2),
        'throughput_mode_trials': [round(t, 2) for t in trials],
        'throughput_mode_median_ips': round(float(np.median(trials)), 2),
        'throughput_device_ips': round(pair_rate, 1),
        'throughput_device_mfu_vs_bf16_peak':
            round(flops_per_img * pair_rate / V5E_PEAK_BF16_FLOPS, 4),
        'throughput_gflops_per_image': round(flops_per_img / 1e9, 2),
    }


def bench_train(batch=128, image=224, steps=8):
    """Flagship stage-1 distillation step, bf16 tails, with cost-analysis
    FLOPs -> train MFU."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent / 'script'))
    from bench_train import build
    box, x = build(jnp.bfloat16, batch, image)
    xr = jnp.asarray(np.random.default_rng(0).normal(0, 1, x.shape),
                     jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)
    box.train_step(xr, y, jax.random.key(0))  # compile
    force(box.state.params)
    flops = program_flops(box._train_step, box.state, xr, y,
                          jax.random.key(0), student_mode='train')
    t0 = time.perf_counter()
    for i in range(steps):
        box.train_step(xr, y, jax.random.key(i + 1))
    force(box.state.params)
    rate = steps / (time.perf_counter() - t0)
    return {
        'train_step_img_per_sec': round(batch * rate, 1),
        'train_step_gflops': round(flops / 1e9, 1),
        'train_mfu_vs_bf16_peak': round(flops * rate /
                                        V5E_PEAK_BF16_FLOPS, 4),
        'train_batch': batch, 'train_image': image,
    }


def _section(name, fn, default):
    """Run one optional bench section; a failure (e.g. a tunnel blip
    mid-run) nulls that section's fields instead of sinking the whole
    record — the driver needs the ONE JSON line either way."""
    import sys
    import traceback
    try:
        return fn()
    except Exception:
        traceback.print_exc(file=sys.stderr)
        print(f'bench section {name!r} failed; recording nulls',
              file=sys.stderr)
        return default


def _bench_device_wire_with_fallback(rt, images):
    """Device-wire benches with an XLA-codec retry: kernel/toolchain
    failure on this backend must not sink the record (the auto gate's
    self-probe normally catches this first). The record is tagged so
    scan-codec numbers are never mistaken for kernel numbers, and the
    original failure goes to stderr."""
    try:
        return (bench_device_wire(rt, images),
                bench_device_wire(rt, images, wire_batch=8), 'auto')
    except Exception:
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        print('device-wire bench failed; retrying with SC2_RANS_BACKEND='
              'xla', file=sys.stderr)
        os.environ['SC2_RANS_BACKEND'] = 'xla'
        rt = build_runtime()
        rt.activate_analysis()
        return (bench_device_wire(rt, images),
                bench_device_wire(rt, images, wire_batch=8),
                'xla-fallback')


def main():
    rt = build_runtime()
    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.normal(0, 1, (1, 224, 224, 3)), jnp.float32)
              for _ in range(8)]
    force(rt(images[0]))  # compile encode+decode, coder
    rt.activate_analysis()

    # the headline deploy loop is mandatory (no record without it);
    # every other section degrades to nulls on failure
    trials, best_timings = bench_deploy(rt, images)
    ips = max(trials)
    serving_trials = _section('serving', lambda: bench_serving(rt, images),
                              [])
    device_wire_trials, wire_batch_trials, rans_backend = _section(
        'device_wire', lambda: _bench_device_wire_with_fallback(rt, images),
        ([], [], 'failed'))
    fresh_ips = _section('fresh_upload', bench_fresh_upload, None)
    device = _section('device_programs',
                      lambda: bench_device_programs(rt, images[0]), {})
    def _throughput():
        rt16 = build_runtime(deploy_bf16_decode=True)
        rt16.activate_analysis()
        return bench_throughput_mode(rt16, images)
    throughput = _section('throughput_mode', _throughput, {})

    def _throughput_bf16enc():
        # opt-in bf16 ENCODER on top of the bf16 decoder: encoder convs
        # at MXU bf16 rate, f32 symbol rounding/entropy math — streams
        # self-consistent and ~1e-4 of the f32 wire size, but NOT
        # byte-identical to the f32 encoder (so it is a separate,
        # non-headline field; see runtime.deploy_bf16_encode).
        rte = build_runtime(deploy_bf16_decode=True,
                            deploy_bf16_encode=True)
        pair, fpi = fused_pair_stats(rte, images, 128)
        return {
            'throughput_bf16enc_device_ips': round(pair, 1),
            'throughput_bf16enc_mfu_vs_bf16_peak':
                round(fpi * pair / V5E_PEAK_BF16_FLOPS, 4)}
    throughput_bf16e = _section('throughput_bf16enc',
                                _throughput_bf16enc, {})
    train = _section('train', bench_train, {})

    n_iter = 120
    baseline = measured_baseline_ips()
    rnd = lambda v: round(v, 2) if v is not None else None  # noqa: E731
    med = lambda ts: float(np.median(ts)) if ts else None  # noqa: E731
    # headline = the MEDIAN of the fastest deploy mode whose DISPATCH is
    # strictly batch-1 (one image per device program call — the metric
    # name's contract): the host-coder pipelined loop or the per-image
    # device-rANS wire. The winning mode is chosen by median (the typical
    # number over a load-varying tunnel); its best-of-trials is kept as
    # "best_ips". Micro-batched modes (decode_batch=8 / wire_batch=8/32)
    # keep per-image bitstreams+accounting but fuse k images per
    # dispatch, so they stay informational fields only.
    modes = {'host_coder_pipelined': med(trials)}
    if device_wire_trials:
        modes['device_wire_rans'] = med(device_wire_trials)
    headline_mode = max(modes, key=modes.get)
    headline = modes[headline_mode]
    best_of = {'host_coder_pipelined': max(trials),
               'device_wire_rans':
                   max(device_wire_trials) if device_wire_trials else None}
    print(json.dumps({
        'metric': 'deploy_images_per_sec_batch1',
        'value': round(headline, 2),
        'unit': 'images/sec',
        'vs_baseline': round(headline / baseline, 2),
        'headline_mode': headline_mode,
        'headline_is_median': True,
        'best_ips': rnd(best_of[headline_mode]),
        'host_coder_ips': round(max(trials), 2),
        'host_coder_median_ips': rnd(med(trials)),
        'baseline_ips_torch_cpu': baseline,
        'trials': [round(t, 2) for t in trials],
        'serving_mode_ips_decode_batch8':
            rnd(max(serving_trials) if serving_trials else None),
        'serving_mode_median_ips': rnd(med(serving_trials)),
        'serving_trials': [round(t, 2) for t in serving_trials],
        'fresh_upload_uint8_ips': rnd(fresh_ips),
        'device_wire_rans_backend': rans_backend,
        'device_wire_rans_ips':
            rnd(max(device_wire_trials) if device_wire_trials else None),
        'device_wire_median_ips': rnd(med(device_wire_trials)),
        'device_wire_trials': [round(t, 2) for t in device_wire_trials],
        'device_wire_batch8_ips':
            rnd(max(wire_batch_trials) if wire_batch_trials else None),
        'device_wire_batch8_median_ips': rnd(med(wire_batch_trials)),
        'device_wire_batch8_trials':
            [round(t, 2) for t in wire_batch_trials],
        'stage_ms_per_image': {
            k: round(v / n_iter * 1000, 2)
            for k, v in sorted(best_timings.items())},
        **device,
        **throughput,
        **throughput_bf16e,
        **train,
    }))


if __name__ == '__main__':
    main()
