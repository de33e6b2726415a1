"""Fast unit tests: transforms (padding, quantizers, codecs), analysis
(model-size accounting), config loading, samplers, metrics."""
import io

import jax.numpy as jnp
import numpy as np
from PIL import Image

from sc2bench_tpu.analysis import (FileSizeAnalyzer, analyze_model_size,
                                   get_binary_object_size)
from sc2bench_tpu.common.config_util import overwrite_config
from sc2bench_tpu.transforms.codec import PILImageModule, PILTensorModule
from sc2bench_tpu.transforms.collator import cat_list, pascal_seg_collate_fn
from sc2bench_tpu.transforms.misc import (AdaptivePad, SimpleDequantizer,
                                          SimpleQuantizer, dequantize_tensor,
                                          quantize_tensor)


def test_adaptive_pad():
    pad = AdaptivePad(factor=64, returns_org_patch_size=True)
    x = jnp.zeros((1, 100, 130, 3))
    out, (h, w) = pad(x)
    assert out.shape == (1, 128, 192, 3)
    assert (h, w) == (100, 130)


def test_quantize_tensor_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 3, (4, 8, 8)).astype(np.float32)
    q = quantize_tensor(x, 8)
    assert q['tensor'].dtype == np.uint8
    x_hat = dequantize_tensor(q)
    # max error bounded by one quantization step
    step = q['scale']
    assert np.abs(x - x_hat).max() <= step * 0.501 + 1e-6


def test_simple_quantizer_fp16():
    x = np.random.default_rng(1).normal(0, 1, (4, 4)).astype(np.float32)
    q = SimpleQuantizer(num_bits=16)(x)
    assert q.dtype == np.float16
    x_hat = SimpleDequantizer(num_bits=16)(q)
    np.testing.assert_allclose(x_hat, x, atol=1e-3)


def test_pil_image_module_roundtrip():
    img = Image.fromarray(np.random.default_rng(2).integers(
        0, 255, (64, 64, 3)).astype(np.uint8))
    rec, size = PILImageModule(returns_file_size=True, format='JPEG',
                               quality=80)(img)
    assert rec.size == img.size
    assert 100 < size < 64 * 64 * 3


def test_pil_tensor_module_feature_roundtrip():
    z = np.random.default_rng(3).normal(0, 1, (16, 16, 7)).astype(np.float32)
    rec, size = PILTensorModule(returns_file_size=True, format='PNG')(z)
    assert rec.shape == z.shape
    # PNG is lossless: reconstruction within uint8 quantization error
    span = z.max() - z.min()
    assert np.abs(rec - z).max() < span / 255 * 1.01
    assert size > 0


def test_cat_list_and_collate():
    imgs = [np.ones((10, 12, 3)), np.ones((8, 14, 3))]
    out = cat_list(imgs, fill_value=0)
    assert out.shape == (2, 10, 14, 3)
    batch = [(np.ones((5, 6, 3)), np.zeros((5, 6))),
             (np.ones((4, 7, 3)), np.zeros((4, 7)))]
    x, t = pascal_seg_collate_fn(batch)
    assert x.shape == (2, 5, 7, 3)
    assert t.shape == (2, 5, 7)
    assert t[1, 4, 0] == 255  # padded target = ignore


def test_analyze_model_size():
    params = {
        'bottleneck_layer': {'encoder': {'conv': {
            'kernel': jnp.zeros((3, 3, 3, 8), jnp.float32)}}},
        'layer2': {'conv': {'kernel': jnp.zeros((1, 1, 8, 16),
                                                jnp.float32)}},
    }
    sizes = analyze_model_size(
        params, encoder_paths=['bottleneck_layer.encoder'])
    assert sizes['encoder'] == 3 * 3 * 3 * 8 * 32
    assert sizes['rest'] == 8 * 16 * 32
    assert sizes['model'] == sizes['encoder'] + sizes['rest']


def test_file_size_analyzer_pickle_semantics():
    a = FileSizeAnalyzer(unit='B')
    obj = {'strings': [[b'x' * 1000]], 'shape': (4, 4)}
    a.analyze(obj)
    s = a.summarize()
    assert abs(s['mean'] - get_binary_object_size(obj, 1)) < 1e-9
    assert s['mean'] > 1000


def test_overwrite_config_deep_merge():
    config = {'a': {'b': 1, 'c': 2}, 'd': 3}
    overwrite_config(config, {'a': {'b': 10}, 'e': 4})
    assert config == {'a': {'b': 10, 'c': 2}, 'd': 3, 'e': 4}


def test_grouped_batch_sampler():
    from sc2bench_tpu.datasets.sampler import (GroupedBatchSampler,
                                               create_aspect_ratio_groups)
    ars = [0.5, 0.6, 1.5, 1.7, 0.55, 1.6]
    groups = create_aspect_ratio_groups(ars, k=1)
    sampler = GroupedBatchSampler(groups, batch_size=2, shuffle=False)
    batches = list(iter(sampler))
    for b in batches:
        gs = {groups[i] for i in b}
        assert len(gs) == 1  # one group per batch
    seen = {i for b in batches for i in b}
    assert seen == set(range(6))


def test_metric_logger():
    from sc2bench_tpu.utils.metrics import MetricLogger
    m = MetricLogger()
    for v in [1.0, 2.0, 3.0]:
        m.update(loss=v)
    assert abs(m.meters['loss'].global_avg - 2.0) < 1e-9
    assert 'loss' in str(m)


def test_encoder_size_metric_on_flagship():
    """The benchmark's encoder-size metric (bits of mobile-side params) on
    the real flagship model: encoder = bottleneck conv/GDN analysis half;
    entropy-bottleneck density params are shared bookkeeping (the
    reference's additional_rest_paths contract, analysis.py:202-264)."""
    import jax
    import jax.numpy as jnp
    from sc2bench_tpu.models.backbone import SplittableResNet
    from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
    from sc2bench_tpu.analysis import analyze_model_size
    model = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=24),
        stage_sizes=(3, 4, 6, 3), num_classes=1000)
    shapes = jax.eval_shape(lambda: model.init(
        {'params': jax.random.key(0), 'noise': jax.random.key(1)},
        jnp.zeros((1, 224, 224, 3)), mode='train'))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          shapes['params'])
    sizes = analyze_model_size(
        params,
        encoder_paths=['bottleneck_layer.encoder',
                       'bottleneck_layer.enc_'])
    assert sizes['encoder'] > 0
    assert sizes['model'] == sizes['encoder'] + sizes['rest']
    # the mobile encoder must be a tiny fraction of the server model
    assert sizes['encoder'] < sizes['model'] * 0.02
    # flagship encoder ~= 2 convs(5x5) + GDNs + 1 conv(2x2) of 96/48/24 ch
    assert 5e5 < sizes['encoder'] < 2e7  # bits


def test_dataloader_num_workers_matches_sequential():
    """Threaded item fetch returns the same batches as sequential fetch
    (order preserved by pool.map)."""
    from sc2bench_tpu.datasets.image import (DataLoader,
                                             SyntheticClassificationDataset)
    ds = SyntheticClassificationDataset(num_samples=13,
                                        image_size=(16, 16))
    seq = list(DataLoader(ds, batch_size=4, prefetch=False))
    par = list(DataLoader(ds, batch_size=4, prefetch=False, num_workers=3))
    assert len(seq) == len(par) == 4
    for (xs, ys), (xp, yp) in zip(seq, par):
        np.testing.assert_array_equal(xs, xp)
        np.testing.assert_array_equal(ys, yp)


def test_pipeline_stream_order_and_depth_bound():
    """The shared deploy-pipeline driver yields results in order and never
    holds more than `depth` dispatched-but-unconsumed items in flight."""
    import threading
    from sc2bench_tpu.models.runtime import pipeline_stream

    in_flight = 0
    peak = 0
    lock = threading.Lock()

    def dispatch(i):
        nonlocal in_flight, peak
        with lock:
            in_flight += 1
            peak = max(peak, in_flight)
        return i

    def host_stage(i):
        import time
        time.sleep(0.002)
        return i * 10

    out = []
    for r in pipeline_stream(40, dispatch, host_stage, depth=3, workers=2):
        with lock:
            in_flight -= 1
        out.append(r)
    assert out == [i * 10 for i in range(40)]
    assert peak <= 4  # depth + the one being dispatched

    # empty stream
    assert list(pipeline_stream(0, dispatch, host_stage)) == []
