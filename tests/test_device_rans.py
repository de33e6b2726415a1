"""Device-side (pure-XLA) interleaved rANS codec tests: bit-exact round
trip under jit, format pinned by a numpy oracle, size tracking the
entropy bound, and the out-of-support fallback signal."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sc2bench_tpu.ops.rans.device import (
    RANS_L, device_rans_decode, device_rans_encode, numpy_oracle_decode,
    numpy_oracle_encode, pack_stream, unpack_stream)


def _tables(num_dists=6, support=33, seed=0):
    """Random 16-bit-precision CDF tables shaped like the production ones
    (zero-padded rows, +2 columns, escape slot)."""
    rng = np.random.default_rng(seed)
    max_len = support + 2
    cdf = np.zeros((num_dists, max_len + 1), np.int32)
    cdf_length = np.full(num_dists, max_len + 1, np.int32)
    offset = rng.integers(-20, -5, num_dists).astype(np.int32)
    for c in range(num_dists):
        w = rng.uniform(0.05, 1.0, max_len)
        freqs = np.maximum((w / w.sum() * (1 << 16)).astype(np.int64), 1)
        freqs[-1] += (1 << 16) - freqs.sum()
        assert freqs.min() >= 1
        cdf[c, 1:] = np.cumsum(freqs)
    return cdf, cdf_length, offset


def _symbols(cdf, cdf_length, offset, n, seed=1):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, cdf.shape[0], n).astype(np.int32)
    # sample from each row's actual distribution (entropy-matched sizes)
    u = rng.integers(0, 1 << 16, n)
    sym = np.empty(n, np.int32)
    for c in range(cdf.shape[0]):
        m = idx == c
        row = cdf[c][:cdf_length[c]]
        # keep inside the coded support (escape slot excluded)
        v = np.clip(np.searchsorted(row, u[m], side='right') - 1,
                    0, cdf_length[c] - 3)
        sym[m] = v + offset[c]
    return sym, idx


@pytest.mark.parametrize('n,num_lanes', [(4096, 256), (1000, 64),
                                         (257, 8)])
def test_roundtrip_bit_exact_under_jit(n, num_lanes):
    cdf, cdf_length, offset = _tables()
    sym, idx = _symbols(cdf, cdf_length, offset, n)
    enc = jax.jit(device_rans_encode,
                  static_argnames=('num_lanes',))(
        sym, idx, cdf, cdf_length, offset, num_lanes=num_lanes)
    assert bool(enc['ok'])
    dec, valid = jax.jit(device_rans_decode,
                         static_argnames=('n_symbols', 'num_lanes'))(
        enc['streams'], enc['states'], idx, cdf, cdf_length, offset,
        n_symbols=n, num_lanes=num_lanes)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def test_format_matches_numpy_oracle():
    """The XLA scan and the plain-python oracle must produce identical
    per-lane streams and states — pins the wire format."""
    cdf, cdf_length, offset = _tables(num_dists=4, support=17, seed=3)
    sym, idx = _symbols(cdf, cdf_length, offset, 777, seed=4)
    lanes = 32
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=lanes)
    o_streams, o_states = numpy_oracle_encode(
        sym, idx, cdf, cdf_length, offset, num_lanes=lanes)
    np.testing.assert_array_equal(np.asarray(enc['states']), o_states)
    lengths = np.asarray(enc['lengths'])
    streams = np.asarray(enc['streams'])
    for j in range(lanes):
        np.testing.assert_array_equal(
            streams[j, :lengths[j]], np.asarray(o_streams[j], np.uint16))
    # oracle decode reads the device-produced streams
    dec = numpy_oracle_decode(
        [list(streams[j, :lengths[j]]) for j in range(lanes)],
        np.asarray(enc['states']), idx, cdf, cdf_length, offset,
        n_symbols=len(sym), num_lanes=lanes)
    np.testing.assert_array_equal(dec, sym)


def test_pack_unpack_roundtrip_and_size():
    cdf, cdf_length, offset = _tables()
    sym, idx = _symbols(cdf, cdf_length, offset, 2048, seed=7)
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=128)
    wire = pack_stream(enc)
    assert len(wire) == int(enc['nbytes'])
    streams, states = unpack_stream(wire)
    np.testing.assert_array_equal(states, np.asarray(enc['states']))
    dec, valid = device_rans_decode(streams, states, idx, cdf, cdf_length,
                                    offset, n_symbols=len(sym),
                                    num_lanes=128)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def test_size_tracks_entropy_bound():
    """Payload bytes within a few percent of the CDF cross-entropy bound
    (lane-state overhead excluded — it's the fixed 6 bytes/lane)."""
    cdf, cdf_length, offset = _tables(num_dists=3, support=65, seed=9)
    n, lanes = 1 << 15, 256
    sym, idx = _symbols(cdf, cdf_length, offset, n, seed=10)
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=lanes)
    payload_bits = 16 * float(np.sum(np.asarray(enc['lengths'])))
    v = sym - offset[idx]
    freqs = (cdf[idx, v + 1] - cdf[idx, v]).astype(np.float64)
    bound_bits = float(-np.sum(np.log2(freqs / (1 << 16))))
    # renorm quantization + per-lane tails cost a little; states carry
    # ~16-32 payload bits each at flush which the bound counts but the
    # stream doesn't
    assert payload_bits <= bound_bits * 1.05 + 16 * lanes
    assert payload_bits >= bound_bits * 0.90 - 32 * lanes


def test_out_of_support_signals_fallback():
    cdf, cdf_length, offset = _tables()
    sym, idx = _symbols(cdf, cdf_length, offset, 512, seed=11)
    sym[100] = offset.min() - 5  # below every support
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=64)
    assert not bool(enc['ok'])


def test_production_tables_roundtrip():
    """Round trip against REAL factorized-prior tables (the flagship's
    update() output), cyclic channel indexes like the deploy layout."""
    from sc2bench_tpu.ops.entropy.factorized import EntropyBottleneck
    from sc2bench_tpu.ops.entropy.tables import build_factorized_tables
    ch = 8
    eb = EntropyBottleneck(channels=ch)
    variables = eb.init({'params': jax.random.key(0)},
                        jnp.zeros((1, 4, 4, ch)), mode='dequantize')
    t = build_factorized_tables(eb, {'params': variables['params']})
    h = w = 14
    rng = np.random.default_rng(0)
    # in-support symbols around the medians
    sym = (np.round(rng.normal(0, 1.5, (h * w * ch)))
           + np.round(t.medians[np.tile(np.arange(ch), h * w)])) \
        .astype(np.int32)
    lo = t.offset[np.tile(np.arange(ch), h * w)]
    hi = lo + t.cdf_length[np.tile(np.arange(ch), h * w)] - 3
    sym = np.clip(sym, lo, hi)
    idx = np.tile(np.arange(ch, dtype=np.int32), h * w)
    enc = device_rans_encode(sym, idx, t.quantized_cdf, t.cdf_length,
                             t.offset, num_lanes=49)
    assert bool(enc['ok'])
    dec, valid = device_rans_decode(
        enc['streams'], enc['states'], idx, t.quantized_cdf, t.cdf_length,
        t.offset, n_symbols=len(sym), num_lanes=49)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)


@pytest.mark.slow
def test_runtime_device_wire_matches_host_path():
    """`stream_deploy_device` (entropy coding fused into the encode
    program, decode from device-resident streams) must produce the same
    logits as the host-coder deploy path, and its accounted bitstream
    must round-trip through pack/unpack + device decode."""
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=64),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, v)
    rt.update()
    rt.eval()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(3)]

    host_logits = [np.asarray(rt(x)) for x in imgs]
    rt.activate_analysis()
    dev = rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    rt.deactivate_analysis()
    assert len(rt.analyzers[0].file_size_list) == len(imgs)
    for h, d in zip(host_logits, dev):
        # same decoded symbols -> same decoder/tail program inputs; logits
        # agree to float roundoff of the shared jitted program
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)

    # two-node path: wire bytes -> unpack -> device decode
    ops = rt.encode_device_wire(imgs[0], num_lanes=64)
    wire = rt._pull_device_wire(ops)
    streams, states = unpack_stream(wire)
    pad = np.zeros((streams.shape[0],
                    ops['streams'].shape[1] - streams.shape[1]), np.uint16)
    logits, valid = rt.decode_device_streams(
        jnp.asarray(np.concatenate([streams, pad], 1)),
        jnp.asarray(states), ops['shape'], num_lanes=64)
    assert bool(valid)
    np.testing.assert_allclose(host_logits[0], np.asarray(logits),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_detection_runtime_device_wire_matches_host():
    """Detection device-rANS wire: fused encode+code and code+detect
    programs must reproduce the host-coder deploy detections exactly
    (same decoded symbols -> same detector program)."""
    from sc2bench_tpu.models.detection.wrapper import SplitDetectionRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401
    model = registry_get('model', 'faster_rcnn_model')(
        num_classes=5,
        backbone_config={
            'resnet_name': 'resnet50',
            'bottleneck_config': {
                'key': 'FPBasedResNetBottleneck',
                'kwargs': {'num_bottleneck_channels': 8,
                           'num_target_channels': 256}}})
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitDetectionRuntime(model, v)
    rt.update()
    rt.activate_analysis()
    batches = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
               for i in range(2)]
    host = rt.stream_detect(batches)
    n_host = len(rt.analyzers[0].file_size_list)
    dev = rt.stream_detect_device(batches, depth=2, workers=2,
                                  num_lanes=64)
    assert len(rt.analyzers[0].file_size_list) == n_host + len(batches)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(np.asarray(h['boxes']),
                                   np.asarray(d['boxes']),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(h['labels']),
                                      np.asarray(d['labels']))
        np.testing.assert_array_equal(np.asarray(h['valid']),
                                      np.asarray(d['valid']))


@pytest.mark.slow
def test_hyperprior_runtime_device_wire_matches_host():
    """SHP device-rANS wire: z (factorized) + y (gaussian, per-element
    device indexes) fused on-device must reproduce the host-coder
    deploy logits."""
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import SHPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    model = SplittableResNet(
        bottleneck_layer=SHPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=64,
            num_latent_channels=4),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, v)
    rt.update()
    rt.eval()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(3)]
    host_logits = [np.asarray(rt(x)) for x in imgs]
    rt.activate_analysis()
    dev = rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    rt.deactivate_analysis()
    assert len(rt.analyzers[0].file_size_list) == len(imgs)
    for h, d in zip(host_logits, dev):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_segmentation_runtime_device_wire_matches_host():
    """Segmentation device-rANS wire must reproduce the host-coder deploy
    outputs (same decoded symbols -> same head program)."""
    from sc2bench_tpu.models.segmentation.wrapper import \
        SplitSegmentationRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401
    model = registry_get('model', 'deeplabv3_model')(
        backbone_name='resnet50', num_classes=5, uses_aux=False,
        bottleneck_config={'key': 'FPBasedResNetBottleneck',
                           'kwargs': {'num_bottleneck_channels': 8,
                                      'num_target_channels': 256}})
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitSegmentationRuntime(model, v)
    assert rt.update()
    rt.eval()
    rt.activate_analysis()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(2)]
    host = [np.asarray(rt(x)) for x in imgs]
    n_host = len(rt.analyzers[0].file_size_list)
    dev = rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    assert len(rt.analyzers[0].file_size_list) == n_host + len(imgs)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


def test_cyclic_fast_path_matches_general_and_oracle():
    """The gather-free fixed-lane-channel path (cyclic_channels=C with
    C | num_lanes) must produce byte-identical streams to the general
    path when no padding is involved, match the oracle's cyclic pad rule
    when padding IS involved, and round-trip exactly."""
    cdf, cdf_length, offset = _tables(num_dists=8, support=21, seed=5)
    C, lanes = 8, 32
    n = 3000  # not a multiple of lanes -> exercises the cyclic pad rule
    idx = np.tile(np.arange(C, dtype=np.int32), n // C + 1)[:n]
    rng = np.random.default_rng(6)
    sym = np.empty(n, np.int32)
    for c in range(C):
        m = idx == c
        sym[m] = rng.integers(offset[c], offset[c] + cdf_length[c] - 3,
                              m.sum())
    e_cyc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                               num_lanes=lanes, cyclic_channels=C)
    assert bool(e_cyc['ok'])
    o_streams, o_states = numpy_oracle_encode(
        sym, idx, cdf, cdf_length, offset, num_lanes=lanes,
        cyclic_channels=C)
    np.testing.assert_array_equal(np.asarray(e_cyc['states']), o_states)
    lengths = np.asarray(e_cyc['lengths'])
    streams = np.asarray(e_cyc['streams'])
    for j in range(lanes):
        np.testing.assert_array_equal(
            streams[j, :lengths[j]], np.asarray(o_streams[j], np.uint16))
    dec, valid = device_rans_decode(
        e_cyc['streams'], e_cyc['states'], idx, cdf, cdf_length, offset,
        n_symbols=n, num_lanes=lanes, cyclic_channels=C)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)
    # pad-free slice: cyclic == general byte-for-byte
    n2 = lanes * 40
    eg = device_rans_encode(sym[:n2], idx[:n2], cdf, cdf_length, offset,
                            num_lanes=lanes)
    ec = device_rans_encode(sym[:n2], idx[:n2], cdf, cdf_length, offset,
                            num_lanes=lanes, cyclic_channels=C)
    np.testing.assert_array_equal(np.asarray(eg['streams']),
                                  np.asarray(ec['streams']))
    np.testing.assert_array_equal(np.asarray(eg['states']),
                                  np.asarray(ec['states']))


def test_auto_lanes_cyclic_divisibility():
    from sc2bench_tpu.ops.rans.device import auto_lanes
    for n, c in [(75264, 24), (1612800, 24), (3136, 16), (200, 24)]:
        lanes = auto_lanes(n, cyclic_channels=c)
        assert lanes % c == 0, (n, c, lanes)
    assert auto_lanes(75264) == 512  # non-cyclic: next pow2 of n/256


def _tiny_cls_runtime():
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=64),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, v)
    rt.update()
    rt.eval()
    return rt


@pytest.mark.slow
def test_stream_device_wire_fallback_on_escape():
    """When the fused encoder signals ok=0 (out-of-support latent), the
    deferred-harvest stream path must transparently redo that image on
    the host-coder path: same logits as the host deploy, and the
    accounting must record the HOST bitstream size for it (not a
    zero-byte device wire)."""
    rt = _tiny_cls_runtime()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(3)]
    host_logits = [np.asarray(rt(x)) for x in imgs]

    forced_bad = 1  # middle image of the stream
    real_enc = rt.encode_device_wire

    def bad_enc(x, num_lanes=256):
        ops = real_enc(x, num_lanes=num_lanes)
        if x is imgs[forced_bad]:
            ops['meta'] = jnp.array([0, 0], jnp.int32)
        return ops

    rt.encode_device_wire = bad_enc
    rt.activate_analysis()
    dev = rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    sizes = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert len(sizes) == len(imgs)
    # every accounted size is a real bitstream (host fallback included)
    assert all(s > 0 for s in sizes)
    for h, d in zip(host_logits, dev):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_mixin_stream_device_wire_fallback_on_escape():
    """Same escape contract for the det/seg mixin
    (`FactorizedDeviceWire.stream_device_wire`), via the segmentation
    runtime: the ok=0 image is redone on the host coder with its real
    byte size accounted."""
    from sc2bench_tpu.models.segmentation.wrapper import \
        SplitSegmentationRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401
    model = registry_get('model', 'deeplabv3_model')(
        backbone_name='resnet50', num_classes=5, uses_aux=False,
        bottleneck_config={'key': 'FPBasedResNetBottleneck',
                           'kwargs': {'num_bottleneck_channels': 8,
                                      'num_target_channels': 256}})
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitSegmentationRuntime(model, v)
    assert rt.update()
    rt.eval()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(2)]
    host = [np.asarray(rt(x)) for x in imgs]

    real_enc = rt.encode_device_wire

    def bad_enc(x, num_lanes=256):
        ops = real_enc(x, num_lanes=num_lanes)
        ops['meta'] = jnp.array([0, 0], jnp.int32)  # force escape on ALL
        return ops

    rt.encode_device_wire = bad_enc
    rt.activate_analysis()
    dev = rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    sizes = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert len(sizes) == len(imgs) and all(s > 0 for s in sizes)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_stream_device_wire_batched_matches_per_image():
    """`wire_batch=k` groups k images per fused dispatch; logits must
    match the host deploy path and the accounted per-image byte sizes
    must be IDENTICAL to the per-image device wire (each image is coded
    independently inside the vmapped program). 5 images with k=3
    exercises the padded remainder group (padded outputs dropped)."""
    rt = _tiny_cls_runtime()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(5)]
    host_logits = [np.asarray(rt(x)) for x in imgs]

    rt.activate_analysis()
    rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    sizes_per_image = list(rt.analyzers[0].file_size_list)
    rt.analyzers[0].clear()
    batched = rt.stream_deploy_device(imgs, depth=2, workers=2,
                                      num_lanes=64, wire_batch=3)
    sizes_batched = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()

    assert sizes_batched == sizes_per_image  # bit-identical coding
    assert len(batched) == len(imgs)
    for h, d in zip(host_logits, batched):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)

    # hyperprior / pull_wire combinations are rejected, not ignored
    with pytest.raises(ValueError):
        rt.stream_deploy_device(imgs, wire_batch=2, pull_wire=True)


def _cyclic_case(C=8, lanes=32, n=3000, seed=6):
    cdf, cdf_length, offset = _tables(num_dists=C, support=21, seed=5)
    idx = np.tile(np.arange(C, dtype=np.int32), n // C + 1)[:n]
    rng = np.random.default_rng(seed)
    sym = np.empty(n, np.int32)
    for c in range(C):
        m = idx == c
        sym[m] = rng.integers(offset[c], offset[c] + cdf_length[c] - 3,
                              m.sum())
    return cdf, cdf_length, offset, idx, sym


@pytest.mark.slow
def test_pallas_decode_bit_exact_interpret():
    """The Pallas decode kernel (interpret mode on CPU) must reproduce
    the XLA scan bit-for-bit, including the end-state validity flag."""
    cdf, cdf_length, offset, idx, sym = _cyclic_case()
    C, lanes, n = 8, 32, len(sym)
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=lanes, cyclic_channels=C)
    assert bool(enc['ok'])
    dec, valid = device_rans_decode(
        enc['streams'], enc['states'], idx, cdf, cdf_length, offset,
        n_symbols=n, num_lanes=lanes, cyclic_channels=C,
        backend='pallas-interpret')
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)
    # corrupt stream -> valid goes False (same contract as the XLA path)
    bad = np.asarray(enc['states']).copy()
    bad[0] ^= 0x5A5A
    _, valid2 = device_rans_decode(
        enc['streams'], bad, idx, cdf, cdf_length, offset,
        n_symbols=n, num_lanes=lanes, cyclic_channels=C,
        backend='pallas-interpret')
    assert not bool(valid2)


@pytest.mark.slow
def test_pallas_decode_lane_blocked_grid():
    """Gridding the independent lanes into blocks is exact (the path
    large det/seg latents take to fit VMEM)."""
    from sc2bench_tpu.ops.rans.pallas_kernel import (
        _pallas_decode_call, pallas_cyclic_decode, pick_lane_block)
    cdf, cdf_length, offset, idx, sym = _cyclic_case(
        C=8, lanes=64, n=6000, seed=7)
    C, lanes, n = 8, 64, len(sym)
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=lanes, cyclic_channels=C)
    full, v1 = pallas_cyclic_decode(
        enc['streams'], enc['states'], cdf, cdf_length, offset,
        n_symbols=n, num_lanes=lanes, cyclic_channels=C, interpret=True)
    assert bool(v1)
    np.testing.assert_array_equal(np.asarray(full), sym)
    # force a 2-block grid through the low-level call
    import jax.numpy as jnp
    lane_ch = np.arange(lanes) % C
    col = np.arange(cdf.shape[1])
    cdf_lane = np.where(col[None, :] < cdf_length[lane_ch][:, None],
                        cdf[lane_ch], 1 << 20).astype(np.int32)
    steps = -(-n // lanes)
    out, xend = _pallas_decode_call(
        jnp.asarray(cdf_lane.T), jnp.asarray(enc['streams']).astype(
            jnp.int32).T, jnp.asarray(enc['states']), steps,
        lane_block=32, interpret=True)
    got = (np.asarray(out) + offset[lane_ch][None, :]).reshape(-1)[:n]
    np.testing.assert_array_equal(got, sym)
    assert np.all(np.asarray(xend) == (1 << 16))
    # gate sanity: applicable shapes return a 128-multiple divisor
    assert pick_lane_block(256, 384, 200, 196) == 384
    b = pick_lane_block(64, 1536, 540, 525)
    assert b is not None and b % 128 == 0 and 1536 % b == 0
    # shapes whose FULL operand/result bytes would overflow XLA's 16M
    # scoped-VMEM stack as ONE call (observed OOM on v5e at the
    # 3072-lane detection latent) get a grouped-vmap plan: batching
    # keeps the operands in HBM, so the kernel still applies
    from sc2bench_tpu.ops.rans.pallas_kernel import (
        pick_decode_plan, pick_encode_plan)
    g, blk = pick_decode_plan(256, 3072, 540, 525)
    assert g > 1 and blk % 128 == 0 and (3072 // g) % blk == 0
    g_e, blk_e = pick_encode_plan(59, 3072, 525)
    assert g_e > 1 and blk_e % 128 == 0 and (3072 // g_e) % blk_e == 0
    # small shapes keep the single-call plan
    assert pick_decode_plan(256, 384, 200, 196) == (1, 384)


@pytest.mark.slow
def test_pallas_encode_bit_exact_interpret():
    """The Pallas encode kernel must produce byte-identical streams,
    lengths and states to the XLA scan (the wire format is pinned)."""
    cdf, cdf_length, offset, idx, sym = _cyclic_case(
        C=8, lanes=32, n=3000, seed=9)
    C, lanes, n = 8, 32, len(sym)
    ex = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                            num_lanes=lanes, cyclic_channels=C,
                            backend='xla')
    ep = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                            num_lanes=lanes, cyclic_channels=C,
                            backend='pallas-interpret')
    assert bool(ep['ok'])
    np.testing.assert_array_equal(np.asarray(ex['states']),
                                  np.asarray(ep['states']))
    np.testing.assert_array_equal(np.asarray(ex['lengths']),
                                  np.asarray(ep['lengths']))
    np.testing.assert_array_equal(np.asarray(ex['streams']),
                                  np.asarray(ep['streams']))
    assert int(ex['nbytes']) == int(ep['nbytes'])
    # full pallas round trip
    dec, valid = device_rans_decode(
        ep['streams'], ep['states'], idx, cdf, cdf_length, offset,
        n_symbols=n, num_lanes=lanes, cyclic_channels=C,
        backend='pallas-interpret')
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)


@pytest.mark.slow
def test_pallas_grouped_lane_vmap_is_exact():
    """The grouped-vmap dispatch (big latents whose full call arrays
    would overflow the scoped-VMEM stack) must reproduce the single
    call bit-for-bit — same symbols, states, chunks, masks."""
    import functools

    import jax.numpy as jnp

    from sc2bench_tpu.ops.rans.pallas_kernel import (
        _grouped, _pallas_decode_call, _pallas_encode_call)
    cdf, cdf_length, offset, idx, sym = _cyclic_case(
        C=8, lanes=256, n=20480, seed=11)
    C, lanes, n = 8, 256, len(sym)
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=lanes, cyclic_channels=C)
    lane_ch = np.arange(lanes) % C
    col = np.arange(cdf.shape[1])
    cdf_lane = np.where(col[None, :] < cdf_length[lane_ch][:, None],
                        cdf[lane_ch], 1 << 20).astype(np.int32)
    steps = -(-n // lanes)
    cdf_t = jnp.asarray(cdf_lane.T)
    streams_t = jnp.asarray(enc['streams']).astype(jnp.int32).T
    states = jnp.asarray(enc['states'])
    call = functools.partial(_pallas_decode_call, steps=steps,
                             lane_block=128, interpret=True)
    out1, xend1 = call(cdf_t, streams_t, states)
    out2, xend2 = _grouped(call, 2, cdf_t, streams_t, states)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(xend1), np.asarray(xend2))
    # encode side: forward-order in-support values per lane
    vc = np.zeros((steps, lanes), np.int32)
    flat = sym - offset[idx]
    vc.reshape(-1)[:n] = flat  # lane-major: position p -> (p//lanes, p%lanes)
    ecall = functools.partial(_pallas_encode_call, steps=steps,
                              lane_block=128, interpret=True)
    c1, m1, x1 = ecall(cdf_t, jnp.asarray(vc))
    c2, m2, x2 = _grouped(ecall, 2, cdf_t, jnp.asarray(vc))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


@pytest.mark.slow
def test_pallas_kernels_compose_with_vmap_wire_batch():
    """`wire_batch` serving groups k images via `jax.vmap` over the codec
    (`runtime.py:encode_device_wire_batch` / `decode_device_streams_batch`);
    the Pallas fast path must batch correctly under vmap and stay
    bit-identical to the vmapped XLA scan (per-image independence)."""
    cdf, cdf_length, offset, idx, sym = _cyclic_case(C=8, lanes=128,
                                                     n=4096)
    C, lanes, n = 8, 128, len(sym)
    # channel-aligned rolls keep every position's distribution fixed
    syms = np.stack([np.roll(sym, k * C) for k in range(3)])
    enc = jax.vmap(lambda s: device_rans_encode(
        s, idx, cdf, cdf_length, offset, num_lanes=lanes,
        cyclic_channels=C, backend='xla'))(jnp.asarray(syms))
    assert bool(np.asarray(enc['ok']).all())
    for backend in ('xla', 'pallas-interpret'):
        out, valid = jax.vmap(lambda st, xs: device_rans_decode(
            st, xs, idx, cdf, cdf_length, offset, n_symbols=n,
            num_lanes=lanes, cyclic_channels=C, backend=backend))(
            enc['streams'], enc['states'])
        assert np.asarray(valid).all(), backend
        np.testing.assert_array_equal(np.asarray(out), syms, backend)
    encp = jax.vmap(lambda s: device_rans_encode(
        s, idx, cdf, cdf_length, offset, num_lanes=lanes,
        cyclic_channels=C, backend='pallas-interpret'))(jnp.asarray(syms))
    for key in ('streams', 'lengths', 'states'):
        np.testing.assert_array_equal(np.asarray(encp[key]),
                                      np.asarray(enc[key]), key)


@pytest.mark.slow
def test_stream_device_wire_fallback_on_invalid_decode():
    """A decode whose rANS lanes do NOT return to the initial state
    (corrupt stream / miscompiled kernel) must be redone on the host
    path — the stream returns correct logits, never the garbage decode."""
    rt = _tiny_cls_runtime()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(3)]
    host_logits = [np.asarray(rt(x)) for x in imgs]

    import itertools
    import threading
    real_dec = rt.decode_device_streams
    counter = itertools.count()
    lock = threading.Lock()

    def bad_dec(streams, states, shape, num_lanes=256):
        logits, valid = real_dec(streams, states, shape,
                                 num_lanes=num_lanes)
        with lock:              # worker threads race the call counter
            nth = next(counter)
        if nth == 1:            # corrupt exactly ONE image's decode
            logits = logits + 1e6
            valid = jnp.asarray(False)
        return logits, valid

    rt.decode_device_streams = bad_dec
    rt.activate_analysis()
    dev = rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    sizes = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert len(sizes) == len(imgs) and all(s > 0 for s in sizes)
    for h, d in zip(host_logits, dev):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


def test_pallas_probe_never_raises_and_caches():
    """`_probe_pallas_kernels` must resolve to a bool without raising on
    any backend (on CPU the compiled kernel path is unsupported -> the
    probe itself is the thing being tested) and cache its verdict."""
    from sc2bench_tpu.ops.rans import device as dev_mod
    old = dev_mod._PALLAS_PROBE_OK
    try:
        dev_mod._PALLAS_PROBE_OK = None
        r1 = dev_mod._probe_pallas_kernels()
        assert isinstance(r1, bool)
        assert dev_mod._PALLAS_PROBE_OK is r1
        assert dev_mod._probe_pallas_kernels() is r1
    finally:
        dev_mod._PALLAS_PROBE_OK = old


@pytest.mark.slow
@pytest.mark.parametrize('lanes,n', [(96, 18816), (24, 4704)])
def test_pallas_padded_lanes_bit_exact(lanes, n):
    """Lane counts that are not multiples of 128 (e.g. 96 at the
    28x28x24 latent of 112px inputs) are padded with inert lanes inside
    the kernel wrappers — wire format unchanged, output bit-identical to
    the XLA scan."""
    cdf, cdf_length, offset, idx, sym = _cyclic_case(C=8, lanes=lanes,
                                                     n=n)
    ex = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                            num_lanes=lanes, cyclic_channels=8,
                            backend='xla')
    assert bool(ex['ok'])
    ep = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                            num_lanes=lanes, cyclic_channels=8,
                            backend='pallas-interpret')
    for k in ('streams', 'lengths', 'states'):
        np.testing.assert_array_equal(np.asarray(ex[k]),
                                      np.asarray(ep[k]), k)
    dec, valid = device_rans_decode(
        ex['streams'], ex['states'], idx, cdf, cdf_length, offset,
        n_symbols=n, num_lanes=lanes, cyclic_channels=8,
        backend='pallas-interpret')
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def _tiny_shp_runtime():
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import SHPBasedResNetBottleneck
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    model = SplittableResNet(
        bottleneck_layer=SHPBasedResNetBottleneck(
            num_bottleneck_channels=8, num_target_channels=64,
            num_latent_channels=4),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitClassifierRuntime(model, v)
    rt.update()
    rt.eval()
    return rt


@pytest.mark.slow
def test_pull_wire_packs_real_streams_factorized_and_hyper():
    """`pull_wire=True` pulls the REAL packed lane wire (two-node
    transmission): accounted sizes must equal the non-pull device wire
    byte-for-byte, logits must match the host path, and the hyperprior
    concatenation must split back into two self-describing lane wires."""
    from sc2bench_tpu.ops.rans.device import (split_wire, unpack_stream,
                                              wire_nbytes)
    for make_rt in (_tiny_cls_runtime, _tiny_shp_runtime):
        rt = make_rt()
        hyper = make_rt is _tiny_shp_runtime
        imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
                for i in range(2)]
        host_logits = [np.asarray(rt(x)) for x in imgs]
        rt.activate_analysis()
        rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
        sizes_res = list(rt.analyzers[0].file_size_list)
        rt.analyzers[0].clear()
        out = rt.stream_deploy_device(imgs, depth=2, workers=2,
                                      num_lanes=64, pull_wire=True)
        sizes_pull = list(rt.analyzers[0].file_size_list)
        rt.deactivate_analysis()
        assert sizes_pull == sizes_res
        for h, d in zip(host_logits, out):
            np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5,
                                       atol=2e-5)
        if hyper:
            # the packed pair must split into two parseable lane wires
            ops = rt.encode_device_wire_hyper(imgs[0], num_lanes=64)
            wire = (rt._pull_device_wire(ops['z'])
                    + rt._pull_device_wire(ops['y']))
            assert len(wire) == int(np.asarray(ops['meta'])[1])
            zw, yw = split_wire(wire)
            # the split boundary must fall exactly at the z wire's own
            # encoded size (and what remains must be exactly the y wire)
            assert len(zw) == int(np.asarray(ops['z']['nbytes']))
            assert len(yw) == int(np.asarray(ops['y']['nbytes']))
            assert wire_nbytes(yw) == len(yw)
            for part in (zw, yw):
                streams, states = unpack_stream(part)
                assert streams.shape[0] == states.shape[0] > 0


@pytest.mark.slow
def test_hyperprior_wire_batched_matches_per_image():
    """`wire_batch=k` on a hyperprior runtime: grouped z/y coding must be
    bit-identical per image to the per-image wire (sizes equal) and the
    logits must match the host deploy path; 3 images with k=2 exercises
    the padded remainder group."""
    rt = _tiny_shp_runtime()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(3)]
    host_logits = [np.asarray(rt(x)) for x in imgs]
    rt.activate_analysis()
    rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    sizes_per_image = list(rt.analyzers[0].file_size_list)
    rt.analyzers[0].clear()
    batched = rt.stream_deploy_device(imgs, depth=2, workers=2,
                                      num_lanes=64, wire_batch=2)
    sizes_batched = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert sizes_batched == sizes_per_image
    assert len(batched) == len(imgs)
    for h, d in zip(host_logits, batched):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


def _tiny_seg_runtime():
    from sc2bench_tpu.models.segmentation.wrapper import \
        SplitSegmentationRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401
    model = registry_get('model', 'deeplabv3_model')(
        backbone_name='resnet50', num_classes=5, uses_aux=False,
        bottleneck_config={'key': 'FPBasedResNetBottleneck',
                           'kwargs': {'num_bottleneck_channels': 8,
                                      'num_target_channels': 256}})
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitSegmentationRuntime(model, v)
    assert rt.update()
    rt.eval()
    return rt


@pytest.mark.slow
def test_mixin_wire_batch_groups_same_shape_canvases():
    """det/seg `wire_batch=k`: consecutive same-shape canvases share a
    fused dispatch pair; per-image accounting and outputs must equal the
    per-image wire, and a shape change must break the group (detection
    canvases are bucketed). 3 same-shape seg images with k=2 exercise
    the padded remainder; the det stream mixes two canvas shapes."""
    rt = _tiny_seg_runtime()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(3)]
    rt.activate_analysis()
    per_image = rt.stream_deploy_device(imgs, depth=2, workers=2,
                                        num_lanes=64)
    sizes_per_image = list(rt.analyzers[0].file_size_list)
    rt.analyzers[0].clear()
    batched = rt.stream_deploy_device(imgs, depth=2, workers=2,
                                      num_lanes=64, wire_batch=2)
    sizes_batched = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert sizes_batched == sizes_per_image
    assert len(batched) == len(imgs)
    for h, d in zip(per_image, batched):
        np.testing.assert_allclose(np.asarray(h), np.asarray(d),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_detection_wire_batch_mixed_canvas_shapes():
    from sc2bench_tpu.models.detection.wrapper import SplitDetectionRuntime
    from sc2bench_tpu.registry import get as registry_get
    import sc2bench_tpu.models  # noqa: F401
    model = registry_get('model', 'faster_rcnn_model')(
        num_classes=5,
        backbone_config={
            'resnet_name': 'resnet50',
            'bottleneck_config': {
                'key': 'FPBasedResNetBottleneck',
                'kwargs': {'num_bottleneck_channels': 8,
                           'num_target_channels': 256}}})
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt = SplitDetectionRuntime(model, v)
    rt.update()
    # two same-shape canvases then a different bucket: groups must be
    # [(0,2), (2,3)] — the shape change closes the first group
    batches = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
               for i in range(2)]
    batches.append(
        jax.random.normal(jax.random.key(9), (1, 64, 96, 3)) * 0.25)
    rt.activate_analysis()
    per_image = rt.stream_detect_device(batches, depth=2, workers=2,
                                        num_lanes=64)
    sizes_per_image = list(rt.analyzers[0].file_size_list)
    rt.analyzers[0].clear()
    batched = rt.stream_detect_device(batches, depth=2, workers=2,
                                      num_lanes=64, wire_batch=2)
    sizes_batched = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert sizes_batched == sizes_per_image
    assert len(batched) == len(batches)
    for h, d in zip(per_image, batched):
        np.testing.assert_allclose(np.asarray(h['boxes']),
                                   np.asarray(d['boxes']),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(h['valid']),
                                      np.asarray(d['valid']))


def test_env_backend_pallas_interpret_works_on_cpu(monkeypatch):
    """SC2_RANS_BACKEND=pallas-interpret must run the kernels in
    interpret mode (the documented CPU-testing path): the env override
    must resolve BEFORE the interpret flag is derived, or the compiled
    Mosaic lowering would be attempted on the CPU backend and crash."""
    monkeypatch.setenv('SC2_RANS_BACKEND', 'pallas-interpret')
    cdf, cdf_length, offset, idx, sym = _cyclic_case(C=8, lanes=32,
                                                     n=1600, seed=12)
    enc = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                             num_lanes=32, cyclic_channels=8,
                             backend='auto')
    assert bool(enc['ok'])
    dec, valid = device_rans_decode(
        enc['streams'], enc['states'], idx, cdf, cdf_length, offset,
        n_symbols=len(sym), num_lanes=32, cyclic_channels=8,
        backend='auto')
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def test_probe_inside_jit_trace_is_not_poisoned(caplog):
    """The auto gate fires at jit-TRACE time; the probe must evaluate
    eagerly there (jax.ensure_compile_time_eval) — before this guard,
    omnistaging staged the probe's internals into the enclosing trace,
    device_get raised a Tracer error, and the broad except permanently
    poisoned the verdict to False."""
    import logging
    from sc2bench_tpu.ops.rans import device as dev_mod
    old = dev_mod._PALLAS_PROBE_OK
    try:
        dev_mod._PALLAS_PROBE_OK = None
        with caplog.at_level(logging.WARNING):
            @jax.jit
            def f(x):
                return x + int(dev_mod._probe_pallas_kernels())
            jax.block_until_ready(f(jnp.ones(2)))
        # on CPU the probe legitimately fails at the compiled-kernel call;
        # what must NOT happen is a Tracer error from the XLA reference
        # computations (that would mean the probe ran staged, not eagerly)
        assert 'Tracer' not in caplog.text
        assert isinstance(dev_mod._PALLAS_PROBE_OK, bool)
    finally:
        dev_mod._PALLAS_PROBE_OK = old


@pytest.mark.slow
def test_cls_wire_batch_mixed_shapes_group_break():
    """Classification `wire_batch=k` must close a group on an image-shape
    change (mixed-resolution serving stream) instead of crashing in
    jnp.stack, with per-image accounting equal to the per-image wire."""
    rt = _tiny_cls_runtime()
    imgs = [jax.random.normal(jax.random.key(0), (1, 64, 64, 3)) * 0.25,
            jax.random.normal(jax.random.key(1), (1, 64, 64, 3)) * 0.25,
            jax.random.normal(jax.random.key(2), (1, 64, 96, 3)) * 0.25]
    host_logits = [np.asarray(rt(x)) for x in imgs]
    rt.activate_analysis()
    rt.stream_deploy_device(imgs, depth=2, workers=2, num_lanes=64)
    sizes_per_image = list(rt.analyzers[0].file_size_list)
    rt.analyzers[0].clear()
    batched = rt.stream_deploy_device(imgs, depth=2, workers=2,
                                      num_lanes=64, wire_batch=2)
    sizes_batched = list(rt.analyzers[0].file_size_list)
    rt.deactivate_analysis()
    assert sizes_batched == sizes_per_image
    for h, d in zip(host_logits, batched):
        np.testing.assert_allclose(h, np.asarray(d), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize('kind', ['fp', 'shp'])
def test_bf16_decode_wire_byte_identical_and_logits_agree(kind):
    """`deploy_bf16_decode`: the decode-side device-wire programs run
    their decoder/tail convs in bfloat16 while the ENCODE program is the
    exact same f32 program — per-image streams, states, and [ok, nbytes]
    metas must be BYTE-IDENTICAL to the f32 wire (the reference's
    compress/data-size contract, sc2bench/models/layer.py:496-521), the
    bf16 decode must still validate (for SHP this proves the f32-kernel
    h_s keeps gaussian indexes bit-exact with the encoder), and logits
    agree on top-1 within bf16 tolerance."""
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import (FPBasedResNetBottleneck,
                                           SHPBasedResNetBottleneck)
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    if kind == 'fp':
        bneck = FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                        num_target_channels=64)
    else:
        bneck = SHPBasedResNetBottleneck(num_bottleneck_channels=8,
                                         num_target_channels=64,
                                         num_latent_channels=4)
    model = SplittableResNet(bottleneck_layer=bneck,
                             stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt32 = SplitClassifierRuntime(model, v)
    rt16 = SplitClassifierRuntime(model, v, deploy_bf16_decode=True)
    for rt in (rt32, rt16):
        rt.update()
        rt.eval()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(4)]

    # byte-identical accounting through the full batched serving loop
    for rt in (rt32, rt16):
        rt.activate_analysis()
    out32 = rt32.stream_deploy_device(imgs, depth=2, workers=2,
                                      wire_batch=2)
    out16 = rt16.stream_deploy_device(imgs, depth=2, workers=2,
                                      wire_batch=2)
    sizes32 = list(rt32.analyzers[0].file_size_list)
    sizes16 = list(rt16.analyzers[0].file_size_list)
    assert sizes32 == sizes16 and len(sizes32) == len(imgs)
    for a, b in zip(out32, out16):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == np.float32
        assert int(np.argmax(a)) == int(np.argmax(b))
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.15)

    # stream/state bit-identity of the encode programs (same program)
    if kind == 'fp':
        e32 = rt32.encode_device_wire(imgs[0])
        e16 = rt16.encode_device_wire(imgs[0])
        for k in ('streams', 'states', 'lengths', 'meta'):
            np.testing.assert_array_equal(np.asarray(e32[k]),
                                          np.asarray(e16[k]))
    else:
        e32 = rt32.encode_device_wire_hyper(imgs[0])
        e16 = rt16.encode_device_wire_hyper(imgs[0])
        for part in ('z', 'y'):
            for k in ('streams', 'states', 'lengths'):
                np.testing.assert_array_equal(np.asarray(e32[part][k]),
                                              np.asarray(e16[part][k]))


@pytest.mark.slow
@pytest.mark.parametrize('kind', ['fp', 'shp'])
def test_bf16_encode_wire_self_consistent_and_near_f32(kind):
    """Opt-in `deploy_bf16_encode`: the device-wire ENCODE programs run
    the encoder convs in bfloat16 (symbol rounding and entropy math stay
    f32 — the layer's dtype contract, models/layer.py). The bitstream is
    NOT byte-identical to the f32 encoder (bf16 latents occasionally
    cross a rounding boundary), but it must be (a) self-consistent —
    the full serving loop decodes its own streams into logits that
    agree with the f32 pipeline's top-1 within bf16 tolerance — and
    (b) rate-neutral: per-image accounted bytes within 2% of the f32
    wire (measured drift ~1e-4, script/probe_bf16_encode.py)."""
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import (FPBasedResNetBottleneck,
                                           SHPBasedResNetBottleneck)
    from sc2bench_tpu.models.runtime import SplitClassifierRuntime
    if kind == 'fp':
        bneck = FPBasedResNetBottleneck(num_bottleneck_channels=8,
                                        num_target_channels=64)
    else:
        bneck = SHPBasedResNetBottleneck(num_bottleneck_channels=8,
                                         num_target_channels=64,
                                         num_latent_channels=4)
    model = SplittableResNet(bottleneck_layer=bneck,
                             stage_sizes=(1, 1, 1, 1), num_classes=10)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, mode='train'))(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)}, x0)
    v = {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}
    rt32 = SplitClassifierRuntime(model, v)
    rte = SplitClassifierRuntime(model, v, deploy_bf16_decode=True,
                                 deploy_bf16_encode=True)
    for rt in (rt32, rte):
        rt.update()
        rt.eval()
        rt.activate_analysis()
    imgs = [jax.random.normal(jax.random.key(i), (1, 64, 64, 3)) * 0.25
            for i in range(4)]

    out32 = rt32.stream_deploy_device(imgs, depth=2, workers=2,
                                      wire_batch=2)
    oute = rte.stream_deploy_device(imgs, depth=2, workers=2,
                                    wire_batch=2)
    sizes32 = list(rt32.analyzers[0].file_size_list)
    sizese = list(rte.analyzers[0].file_size_list)
    assert len(sizese) == len(imgs)
    for s32, se in zip(sizes32, sizese):
        assert abs(se - s32) <= max(0.02 * s32, 2.0 / 1024), (s32, se)
    for a, b in zip(out32, oute):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == np.float32
        assert int(np.argmax(a)) == int(np.argmax(b))
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.15)

    # the bf16-encode program pair round-trips ITS OWN wire: decode
    # validates (no out-of-support escape) on every image
    if kind == 'fp':
        e = rte.encode_device_wire(imgs[0])
        logits, valid = rte.decode_device_streams(
            e['streams'], e['states'], e['shape'])
        assert bool(np.asarray(valid))
        assert np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------------------
# Aligned stream layout (the batched fused-serving format)
# ---------------------------------------------------------------------------

def _assert_aligned_equals_compacted(enc_c, enc_a):
    """Pin the aligned-layout contract: identical lengths/states/nbytes,
    and per lane the mask-selected aligned chunks ARE the compacted row
    (hence the identical packed wire)."""
    from sc2bench_tpu.ops.rans.device import pack_stream_aligned
    for k in ('lengths', 'states', 'nbytes', 'ok'):
        np.testing.assert_array_equal(np.asarray(enc_c[k]),
                                      np.asarray(enc_a[k]), k)
    sa = np.asarray(enc_a['streams'])
    ma = np.asarray(enc_a['masks']).astype(bool)
    sc = np.asarray(enc_c['streams'])
    lens = np.asarray(enc_c['lengths'])
    for j in range(sa.shape[0]):
        np.testing.assert_array_equal(sa[j][ma[j]], sc[j][:lens[j]])
    assert pack_stream_aligned(enc_a) == pack_stream(
        {k: np.asarray(enc_c[k]) for k in ('streams', 'lengths',
                                           'states')})


@pytest.mark.parametrize('cyclic', [False, True])
def test_aligned_layout_matches_compacted_and_roundtrips(cyclic):
    """aligned=True changes only the in-memory layout: same lengths,
    states, byte accounting, and packed wire as the compacted format;
    the aligned decoder recovers the symbols bit-exactly (both the
    cyclic fast path and the general per-symbol-index path)."""
    if cyclic:
        cdf, cdf_length, offset, idx, sym = _cyclic_case(C=8, lanes=32,
                                                         n=3000)
        kw = dict(num_lanes=32, cyclic_channels=8)
    else:
        cdf, cdf_length, offset = _tables()
        sym, idx = _symbols(cdf, cdf_length, offset, 3000)
        kw = dict(num_lanes=64)
    enc_c = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                               backend='xla', **kw)
    enc_a = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                               backend='xla', aligned=True,
                               want_masks=True, **kw)
    assert bool(enc_a['ok'])
    _assert_aligned_equals_compacted(enc_c, enc_a)
    dec, valid = device_rans_decode(
        enc_a['streams'], enc_a['states'], idx, cdf, cdf_length, offset,
        n_symbols=len(sym), backend='xla', aligned=True, **kw)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(dec), sym)
    # feeding a compacted wire to the aligned decoder is rejected when
    # the width is too narrow (compacted width == steps here, so instead
    # pin that decoding the WRONG layout fails the validity check)
    dec_w, valid_w = device_rans_decode(
        enc_c['streams'], enc_c['states'], idx, cdf, cdf_length, offset,
        n_symbols=len(sym), backend='xla', aligned=True, **kw)
    assert not bool(valid_w) or not np.array_equal(np.asarray(dec_w), sym)


@pytest.mark.slow
def test_aligned_pallas_kernels_bit_exact_interpret():
    """Aligned Pallas encode/decode kernels (interpret mode) are
    bit-identical to the aligned XLA scan, including under vmap (the
    batched-serving lowering) and with padded (non-multiple-of-128)
    lane counts."""
    for lanes, n in ((128, 4096), (96, 3072)):
        cdf, cdf_length, offset, idx, sym = _cyclic_case(C=8, lanes=lanes,
                                                         n=n)
        ref = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                                 num_lanes=lanes, cyclic_channels=8,
                                 backend='xla', aligned=True,
                                 want_masks=True)
        got = device_rans_encode(sym, idx, cdf, cdf_length, offset,
                                 num_lanes=lanes, cyclic_channels=8,
                                 backend='pallas-interpret', aligned=True,
                                 want_masks=True)
        for k in ('streams', 'lengths', 'states', 'masks'):
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(got[k]), k)
        dec, valid = device_rans_decode(
            ref['streams'], ref['states'], idx, cdf, cdf_length, offset,
            n_symbols=n, num_lanes=lanes, cyclic_channels=8,
            backend='pallas-interpret', aligned=True)
        assert bool(valid)
        np.testing.assert_array_equal(np.asarray(dec), sym)
        # vmapped (batched) lowering
        syms = np.stack([np.roll(sym, k * 8) for k in range(2)])
        encb = jax.vmap(lambda s: device_rans_encode(
            s, idx, cdf, cdf_length, offset, num_lanes=lanes,
            cyclic_channels=8, backend='pallas-interpret',
            aligned=True))(jnp.asarray(syms))
        refb = jax.vmap(lambda s: device_rans_encode(
            s, idx, cdf, cdf_length, offset, num_lanes=lanes,
            cyclic_channels=8, backend='xla', aligned=True))(
            jnp.asarray(syms))
        for k in ('streams', 'lengths', 'states'):
            np.testing.assert_array_equal(np.asarray(encb[k]),
                                          np.asarray(refb[k]), k)
        decb, validb = jax.vmap(lambda st, xs: device_rans_decode(
            st, xs, idx, cdf, cdf_length, offset, n_symbols=n,
            num_lanes=lanes, cyclic_channels=8,
            backend='pallas-interpret', aligned=True))(
            encb['streams'], encb['states'])
        assert bool(np.asarray(validb).all())
        np.testing.assert_array_equal(np.asarray(decb), syms)
