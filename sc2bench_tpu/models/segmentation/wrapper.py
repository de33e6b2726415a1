"""Segmentation wrappers: codec / neural input compression.

Parity surface of `/root/reference/sc2bench/models/segmentation/wrapper.py`:
`CodecInputCompressionSegmentationModel` (`wrapper.py:12-52`) and
`NeuralInputCompressionSegmentationModel` with AdaptivePad + original-size
crop-back (`wrapper.py:55-117`), plus `get_wrapped_segmentation_model`
(`wrapper.py:120-144`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...analysis import AnalyzerHolder
from ...registry import get as registry_get, register_wrapper
from ...transforms.misc import AdaptivePad
from ..device_wire import FactorizedDeviceWire


def _build_transform(cfg):
    from ..wrapper import _build_transform as bt
    return bt(cfg)


@register_wrapper
class CodecInputCompressionSegmentationModel(AnalyzerHolder):
    """Host codec round-trip then segmentation (reference `wrapper.py:12-52`)."""

    def __init__(self, segmentation_module, segmentation_variables,
                 codec_encoder_decoder=None, post_transform=None,
                 analysis_config=None, **kwargs):
        super().__init__((analysis_config or {}).get('analyzer_configs', []))
        self.codec = _build_transform(codec_encoder_decoder)
        self.post_transform = _build_transform(post_transform)
        self.module = segmentation_module
        self.variables = segmentation_variables
        self._fwd = jax.jit(lambda v, x: self.module.apply(
            v, x, mode='finetune', train=False))

    def __call__(self, images):
        from ..wrapper import to_pil
        batch = []
        for img in images:
            if self.codec is not None:
                out = self.codec(to_pil(img))
                if isinstance(out, tuple):
                    img, file_size = out
                    self.analyze(file_size)
                else:
                    img = out
            if self.post_transform is not None:
                img = self.post_transform(img)
            batch.append(np.asarray(img, np.float32))
        return self._fwd(self.variables, jnp.asarray(np.stack(batch)))


@register_wrapper
class NeuralInputCompressionSegmentationModel(AnalyzerHolder):
    """Learned codec round-trip with AdaptivePad → compress/decompress →
    crop back to the original size (reference `wrapper.py:55-117`)."""

    def __init__(self, segmentation_module, segmentation_variables,
                 compression_model=None, pre_transform=None,
                 post_transform=None, analysis_config=None,
                 adaptive_pad_kwargs=None, **kwargs):
        analysis_config = analysis_config or {}
        super().__init__(analysis_config.get('analyzer_configs', []))
        self.analyzes_after_compress = analysis_config.get(
            'analyzes_after_compress', False)
        self.compression_model = compression_model
        self.pre_transform = _build_transform(pre_transform)
        self.post_transform = _build_transform(post_transform)
        self.adaptive_pad = AdaptivePad(
            **(adaptive_pad_kwargs or {'factor': 64}),
            returns_org_patch_size=True)
        self.module = segmentation_module
        self.variables = segmentation_variables
        self._fwd = jax.jit(lambda v, x: self.module.apply(
            v, x, mode='finetune', train=False))

    def __call__(self, images):
        batch = []
        for img in images:
            if self.pre_transform is not None:
                img = self.pre_transform(img)
            x = np.asarray(img, np.float32)
            if self.compression_model is not None:
                padded, (h, w) = self.adaptive_pad(jnp.asarray(x))
                compressed = self.compression_model.compress(
                    np.asarray(padded)[None])
                if self.analyzes_after_compress or self.activated_analysis:
                    self.analyze(compressed)
                x_hat = np.asarray(
                    self.compression_model.decompress(**compressed))[0]
                x = x_hat[:h, :w]
            if self.post_transform is not None:
                x = self.post_transform(x)
            batch.append(np.asarray(x, np.float32))
        return self._fwd(self.variables, jnp.asarray(np.stack(batch)))


class SplitSegmentationRuntime(FactorizedDeviceWire, AnalyzerHolder):
    """Deploy runtime for splittable (entropic-student) segmentation:
    encode → rANS → decode → heads, with data-size analysis at batch 1
    (reference eval path, SURVEY.md §3.4)."""

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
        self.training = False
        self._jit = {}
        import threading
        self._jit_lock = threading.Lock()

    def update(self):
        from ...ops.entropy.factorized import EntropyBottleneck
        try:
            eb_channels = int(self.codec.eb_params(self.variables)
                              ['quantiles'].shape[0])
        except (KeyError, AttributeError, TypeError):
            return False  # no entropy bottleneck (e.g. CR+BQ SimpleBottleneck)
        eb = EntropyBottleneck(channels=eb_channels)
        self.codec.update(self.module, self.variables, eb)
        # device-resident medians: re-uploading per call costs one
        # host->device round trip per image over a remote-TPU tunnel
        self._medians_dev = jnp.asarray(self.codec.tables.medians)
        self._cdf_dev = None  # device-wire table cache (rebuilt lazily)
        self.bottleneck_updated = True
        return True

    def eval(self):
        self.training = False
        return self

    def _encode_device(self, x):
        import jax
        if 'enc' not in self._jit:
            # int16 on the wire (device->host): halves the transfer and
            # feeds the cyclic coder without transposes or widening;
            # double-checked lock against stream worker threads racing
            # the first compile
            from ..runtime import to_wire
            with self._jit_lock:
                if 'enc' not in self._jit:
                    self._jit['enc'] = jax.jit(
                        lambda v, x, m: to_wire(
                            self.module.apply(
                                v, x, m, method=lambda mod, x, med:
                                    mod.encode_ops(x, med))))
        return self._jit['enc'](self.variables, x, self._medians_dev)

    def _host_stage(self, ops, hw):
        import jax
        symbols = np.asarray(ops['symbols'])
        strings = self.codec.compress_wire(symbols)
        compressed = {'strings': [strings],
                      'shape': tuple(symbols.shape[1:3])}
        self.analyze(compressed)
        channels = self.codec.tables.medians.shape[0]
        decoded = self.codec.decompress_wire(
            compressed['strings'][0], compressed['shape'], channels)
        key = f'dec_{hw[0]}x{hw[1]}'
        if key not in self._jit:
            with self._jit_lock:
                if key not in self._jit:
                    self._jit[key] = jax.jit(
                        lambda v, s, m: self.module.apply(
                            v, s, m, tuple(hw),
                            method=lambda mod, s, med, ihw:
                                mod.decode_ops_to_output(s, med, ihw)))
        return self._jit[key](self.variables, jnp.asarray(decoded),
                              self._medians_dev)

    # ---- device-rANS wire (entropy coding ON the TPU) -------------------
    # Tables / latent probe / fused encode / pipelined stream come from
    # the shared `FactorizedDeviceWire` mixin; only the decode tail (IGDN
    # decode -> dilated tail -> DeepLab head -> upsample to input size)
    # is seg-specific.

    def _jitted(self, key, fn):
        import jax
        if key not in self._jit:
            with self._jit_lock:
                if key not in self._jit:
                    self._jit[key] = jax.jit(fn)
        return self._jit[key]

    def _wire_dec_fn(self, lat_shape, hw, num_lanes, batch_hint=1):
        from ...ops.rans.device import device_rans_decode
        h, w, c = lat_shape

        def dec_fn(v, streams, states, m, cdf, cdf_len, off):
            idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), h * w)
            flat, valid = device_rans_decode(
                streams, states, idx, cdf, cdf_len, off,
                n_symbols=h * w * c, num_lanes=num_lanes,
                cyclic_channels=c, batch_hint=batch_hint)
            return self.module.apply(
                v, flat.reshape(1, h, w, c), m, tuple(hw),
                method=lambda mod, s, med, ihw:
                    mod.decode_ops_to_output(s, med, ihw)), valid
        return dec_fn

    def stream_deploy_device(self, images, depth: int = 8,
                             workers: int = 4, num_lanes: int | None = None,
                             wire_batch: int | None = None,
                             timings: dict | None = None):
        """Pipelined deploy with the interleaved device-rANS codec fused
        into the encode and decode programs (`ops/rans/device.py`): the
        stride-8 seg latent (e.g. 64x64x24 at 512px) never crosses the
        host boundary; one 8-byte meta read per image does the byte
        accounting, out-of-support latents fall back to the host coder
        (`FactorizedDeviceWire.stream_device_wire`)."""
        return self.stream_device_wire(images, depth=depth,
                                       workers=workers,
                                       num_lanes=num_lanes,
                                       wire_batch=wire_batch,
                                       timings=timings)

    def __call__(self, x):
        import jax
        x = jnp.asarray(x)
        if not (self.bottleneck_updated and not self.training):
            return self.module.apply(
                self.variables, x, mode='train', train=False,
                rngs={'noise': jax.random.key(0)})
        ops = self._encode_device(x)
        return self._host_stage(ops, x.shape[1:3])

    def stream_deploy(self, images, depth: int = 4, workers: int = 4):
        """Pipelined batch-1 deploy over a stream of images (the VOC eval
        loop) — encodes overlap host entropy coding, mirroring the
        classification runtime. Returns per-image outputs in order."""
        import jax
        from ..runtime import copy_async, pipeline_stream
        images = list(images)

        def dispatch(i):
            x = jnp.asarray(images[i])
            ops = self._encode_device(x)
            copy_async(ops)
            return ops, x.shape[1:3]

        results = list(pipeline_stream(
            len(images), dispatch, lambda args: self._host_stage(*args),
            depth, workers))
        if results:
            jax.block_until_ready(results[-1])
        return results


def get_wrapped_segmentation_model(wrapper_model_config, **kwargs):
    """Build base segmentation model + wrap (reference `wrapper.py:120-144`).
    A `compression_model` block builds a neural image codec from the zoo."""
    from .registry import load_segmentation_model
    model_config = wrapper_model_config.get('segmentation_model',
                                            wrapper_model_config.get('model'))
    module, variables = load_segmentation_model(model_config)
    key = wrapper_model_config['key']
    cls = registry_get('wrapper', key)
    cm_cfg = wrapper_model_config.get('compression_model')
    if cm_cfg is not None and 'compression_model' not in kwargs:
        from ..registry import get_compression_model
        kwargs['compression_model'] = get_compression_model(cm_cfg)
    return cls(module, variables, **wrapper_model_config.get('kwargs', {}),
               **kwargs)
