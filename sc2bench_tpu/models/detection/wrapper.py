"""Input-compression detection wrapper.

Parity surface of `/root/reference/sc2bench/models/detection/wrapper.py`:
`InputCompressionDetectionModel` swaps the detector's transform for
`RCNNTransformWithCompression` (`wrapper.py:11-95`) and
`get_wrapped_detection_model` builds from config (`wrapper.py:98-122`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...analysis import AnalyzerHolder, get_analyzer
from ...registry import get as registry_get, register_wrapper
from ..device_wire import FactorizedDeviceWire
from .transform import RCNNTransform, RCNNTransformWithCompression


class DetectionRuntime(AnalyzerHolder):
    """Host transform + jitted detector forward + postprocess, returning
    per-image detection dicts scaled back to original coordinates."""

    def __init__(self, module, variables, transform=None,
                 analyzer_configs=None):
        super().__init__(analyzer_configs or [])
        self.module = module
        self.variables = variables
        self.transform = transform or RCNNTransform()
        self._fwd = None

    def _forward(self, batch):
        from .rcnn import postprocess_detections
        if self._fwd is None:
            def fn(variables, x):
                out = self.module.apply(variables, x, mode='finetune',
                                        train=False)
                dets = postprocess_detections(out)
                return dets
            self._fwd = jax.jit(fn)
        return self._fwd(self.variables, jnp.asarray(batch))

    def __call__(self, images):
        batch, scales, orig_sizes = self.transform(images)
        dets = self._forward(batch)
        results = []
        for i in range(len(images)):
            valid = np.asarray(dets['valid'][i])
            boxes = np.asarray(dets['boxes'][i])[valid] / scales[i]
            results.append({
                'boxes': boxes,
                'scores': np.asarray(dets['scores'][i])[valid],
                'labels': np.asarray(dets['labels'][i])[valid],
            })
        return results


@register_wrapper
class InputCompressionDetectionModel(DetectionRuntime):
    """Detector whose transform compresses inputs (reference
    `wrapper.py:11-95`)."""

    def __init__(self, detection_module, detection_variables,
                 codec_config=None, compression_model=None,
                 analysis_config=None, **kwargs):
        analyzer_configs = (analysis_config or {}).get(
            'analyzer_configs', [{'key': 'FileSizeAccumulator',
                                  'kwargs': {'unit': 'KB'}}])
        super().__init__(detection_module, detection_variables,
                         analyzer_configs=analyzer_configs)
        compressor = None
        if codec_config:
            cls = registry_get('transform', codec_config['key'])
            compressor = cls(**codec_config.get('kwargs', {}),
                             returns_file_size=True)
        analyzer = self.analyzers[0] if self.analyzers else None
        self.transform = RCNNTransformWithCompression(
            compressor=compressor, compression_model=compression_model,
            analyzer=analyzer, **kwargs.get('transform_kwargs', {}))


class SplitDetectionRuntime(FactorizedDeviceWire, AnalyzerHolder):
    """Deploy runtime for splittable (entropic-student) detection: encode the
    bottleneck latent → rANS bytes (data-size analysis) → decode → FPN/RPN/
    RoI heads (the reference's FeatureExtractionBackbone encode→analyze→
    decode eval path, SURVEY.md §3.3)."""

    def __init__(self, module, variables, analyzer_configs=None):
        from ..runtime import FactorizedCodec
        if analyzer_configs is None:
            analyzer_configs = [{'key': 'FileSizeAnalyzer',
                                 'kwargs': {'unit': 'KB'}}]
        super().__init__(analyzer_configs)
        self.module = module
        self.variables = variables
        self.codec = FactorizedCodec(
            bottleneck_path='backbone.bottleneck_layer')
        self.bottleneck_updated = False
        self._jit = {}
        import threading
        self._jit_lock = threading.Lock()

    def update(self):
        from ...ops.entropy.factorized import EntropyBottleneck
        eb_channels = int(self.codec.eb_params(self.variables)
                          ['quantiles'].shape[0])
        eb = EntropyBottleneck(channels=eb_channels)
        self.codec.update(self.module, self.variables, eb)
        self._medians_dev = jnp.asarray(self.codec.tables.medians)
        self._cdf_dev = None  # device-wire table cache (rebuilt lazily)
        self.bottleneck_updated = True
        return True

    def _jitted(self, name, fn):
        # double-checked lock: stream worker threads otherwise race the
        # first compile and pay it `workers` times over
        if name not in self._jit:
            with self._jit_lock:
                if name not in self._jit:
                    self._jit[name] = jax.jit(fn)
        return self._jit[name]

    def _encode_device(self, x):
        """Dispatch the mobile-side program; int16 wire + cyclic coder so
        the host never transposes/widens (the detection canvas latent is
        large — e.g. 200x336x24 at the 800/1333 geometry)."""
        from ..runtime import to_wire
        return self._jitted('enc', lambda v, x, m: to_wire(
            self.module.apply(
                v, x, m, method=lambda mod, x, med:
                    mod.encode_ops(x, med))))(
            self.variables, x, self._medians_dev)

    def _decode_call(self, decoded, hw):
        """Server-side program for canvas `hw` (one compiled program per
        canvas bucket)."""
        from .rcnn import postprocess_detections
        def dec(v, s, m):
            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                out = mod.forward_from_bottleneck(c2, tuple(hw))
                return postprocess_detections(out)
            return self.module.apply(v, s, m, method=m_fn)
        return self._jitted(f'dec_{hw[0]}x{hw[1]}', dec)(
            self.variables, jnp.asarray(decoded), self._medians_dev)

    def _host_stage(self, ops, hw):
        symbols = np.asarray(ops['symbols'])
        strings = self.codec.compress_wire(symbols)
        self.analyze({'strings': [strings],
                      'shape': tuple(symbols.shape[1:3])})
        decoded = self.codec.decompress_wire(
            strings, symbols.shape[1:3], symbols.shape[-1])
        return self._decode_call(decoded, hw)

    def detect(self, batch):
        """batch: NHWC canvas images. Returns dense detections + records the
        per-image bottleneck bitstream size."""
        x = jnp.asarray(batch)
        ops = self._encode_device(x)
        return self._host_stage(ops, x.shape[1:3])

    # ---- device-rANS wire (entropy coding ON the TPU) -------------------
    # The detection latent is the big one (e.g. 200x336x24 = 1.6M symbols
    # at the 800/1333 geometry — two ~3 MB host hops per image on the
    # symbol wire). The shared `FactorizedDeviceWire` mixin fuses the
    # interleaved rANS codec (ops/rans/device.py) into the encode/decode
    # programs, removing both: only an 8-byte [ok, nbytes] meta crosses
    # per image for byte accounting.

    def _wire_dec_fn(self, lat_shape, hw, num_lanes, batch_hint=1):
        from ...ops.rans.device import device_rans_decode
        from .rcnn import postprocess_detections
        h, w, c = lat_shape

        def dec(v, streams, states, m, cdf, cdf_len, off):
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), h * w)
            flat, valid = device_rans_decode(
                streams, states, idx, cdf, cdf_len, off,
                n_symbols=h * w * c, num_lanes=num_lanes,
                cyclic_channels=c, batch_hint=batch_hint)

            def m_fn(mod, s, med):
                c2 = mod.decode_ops(s, med)
                out = mod.forward_from_bottleneck(c2, tuple(hw))
                return postprocess_detections(out)
            return self.module.apply(v, flat.reshape(1, h, w, c), m,
                                     method=m_fn), valid
        return dec

    def decode_device_streams(self, streams, states, lat_shape, hw,
                              num_lanes=4096):
        return self._wire_decode({'streams': streams, 'states': states,
                                  'lat_shape': lat_shape}, hw, num_lanes)

    def stream_detect_device(self, batches, depth: int = 8,
                             workers: int = 4, num_lanes: int | None = None,
                             wire_batch: int | None = None,
                             timings: dict | None = None):
        """Pipelined deploy with the device-rANS wire: per image, one
        fused encode+entropy-code dispatch, one fused entropy-decode+
        detect dispatch, and one 8-byte meta read (exact byte
        accounting). Out-of-support latents fall back to the host coder
        per image (`FactorizedDeviceWire.stream_device_wire`)."""
        return self.stream_device_wire(batches, depth=depth,
                                       workers=workers,
                                       num_lanes=num_lanes,
                                       wire_batch=wire_batch,
                                       timings=timings)

    def stream_detect(self, batches, depth: int = 4, workers: int = 4):
        """Software-pipelined deploy over a stream of canvas batches (the
        COCO eval loop): encodes for upcoming images overlap the host
        entropy coding of earlier ones, exactly like the classification
        runtime's `stream_deploy`. Returns per-batch detection dicts in
        order. Byte accounting follows the reference's per-forward
        semantics (`FileSizeAnalyzer.analyze` of the whole compressed
        object): per-sample exactly when the loader batch size is 1 — the
        benchmark's data-size protocol (reference README.md:99-103)."""
        from ..runtime import copy_async, pipeline_stream
        batches = list(batches)

        def dispatch(i):
            x = jnp.asarray(batches[i])
            ops = self._encode_device(x)
            copy_async(ops)
            return ops, x.shape[1:3]

        results = list(pipeline_stream(
            len(batches), dispatch, lambda args: self._host_stage(*args),
            depth, workers))
        if results:
            jax.block_until_ready(jax.tree.leaves(results[-1]))
        return results


def get_wrapped_detection_model(wrapper_model_config, **kwargs):
    """Build base detector + wrap (reference `wrapper.py:98-122`). A
    `compression_model` block builds a neural image codec from the zoo."""
    from .registry import load_detection_model
    model_config = wrapper_model_config.get('detection_model',
                                            wrapper_model_config.get('model'))
    module, variables = load_detection_model(model_config)
    key = wrapper_model_config['key']
    cls = registry_get('wrapper', key)
    cm_cfg = wrapper_model_config.get('compression_model')
    if cm_cfg is not None and 'compression_model' not in kwargs:
        from ..registry import get_compression_model
        kwargs['compression_model'] = get_compression_model(cm_cfg)
    return cls(module, variables, **wrapper_model_config.get('kwargs', {}),
               **kwargs)
