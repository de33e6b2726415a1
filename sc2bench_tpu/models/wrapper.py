"""Full-pipeline wrapper models selected by config `key`.

Parity surface of `/root/reference/sc2bench/models/wrapper.py:29-368`:
  CodecInputCompressionClassifier   — host codec round-trip → classifier
  NeuralInputCompressionClassifier  — learned image codec → classifier
  CodecFeatureCompressionClassifier — codec on an intermediate feature
  EntropicClassifier                — split + EntropyBottleneckLayer
  SplitClassifier                   — split + SimpleQuantizer/Dequantizer

TPU placement mirrors the reference: codecs run on host CPU
(`uses_cpu4compression` is the default and only mode — PIL/BPG/VTM are host
codecs), the classifier tail is a jitted TPU program.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis import AnalyzerHolder
from ..registry import get as registry_get, register_wrapper
from .registry import load_classification_model
from .runtime import SplitClassifierRuntime

logger = logging.getLogger(__name__)


def to_pil(img):
    """Coerce an HWC array (uint8 or float in [0,1]/normalized) to PIL for
    the host codecs; PIL images pass through."""
    from PIL import Image
    if isinstance(img, Image.Image):
        return img
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        lo, hi = float(arr.min()), float(arr.max())
        if lo >= 0.0 and hi <= 1.0:
            arr = (arr * 255.0).round()
        else:  # normalized/arbitrary range: min-max to 8-bit
            arr = (arr - lo) / max(hi - lo, 1e-12) * 255.0
        arr = arr.astype(np.uint8)
    return Image.fromarray(arr)


def _build_transform(cfg):
    if cfg is None:
        return None
    if isinstance(cfg, (list, tuple)):
        transforms = [_build_transform(c) for c in cfg]

        def chain(x):
            for t in transforms:
                x = t(x)
            return x
        return chain
    return registry_get('transform', cfg['key'])(**cfg.get('kwargs', {}))


class _JittedClassifier:
    """Shared classifier-apply plumbing (jitted once)."""

    def __init__(self, classifier_module, classifier_variables):
        self.module = classifier_module
        self.variables = classifier_variables
        self._fn = jax.jit(lambda v, x: self.module.apply(v, x, train=False))

    def logits(self, x):
        return self._fn(self.variables, jnp.asarray(x, jnp.float32))


@register_wrapper
class CodecInputCompressionClassifier(AnalyzerHolder):
    """Per-sample host codec round-trip then classification
    (reference `wrapper.py:29-77`). Input: PIL images (list) pre-transform."""

    def __init__(self, classifier_module, classifier_variables,
                 codec_encoder_decoder=None, post_transform=None,
                 analysis_config=None, **kwargs):
        super().__init__((analysis_config or {}).get('analyzer_configs', []))
        self.codec = _build_transform(codec_encoder_decoder)
        self.post_transform = _build_transform(post_transform)
        self.classifier = _JittedClassifier(classifier_module,
                                            classifier_variables)

    def __call__(self, images):
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
        return self.classifier.logits(np.stack(batch))


@register_wrapper
class NeuralInputCompressionClassifier(AnalyzerHolder):
    """Learned image-codec compress/decompress then classification
    (reference `wrapper.py:80-135`)."""

    def __init__(self, classifier_module, classifier_variables,
                 compression_model=None, pre_transform=None,
                 post_transform=None, analysis_config=None, **kwargs):
        analysis_config = analysis_config or {}
        super().__init__(analysis_config.get('analyzer_configs', []))
        self.analyzes_after_compress = analysis_config.get(
            'analyzes_after_compress', False)
        self.compression_model = compression_model  # models/zoo.py runtime
        self.pre_transform = _build_transform(pre_transform)
        self.post_transform = _build_transform(post_transform)
        self.classifier = _JittedClassifier(classifier_module,
                                            classifier_variables)

    def __call__(self, images):
        batch = []
        for img in images:
            if self.pre_transform is not None:
                img = self.pre_transform(img)
            x = np.asarray(img, np.float32)
            if self.compression_model is not None:
                compressed = self.compression_model.compress(x[None])
                if self.analyzes_after_compress or self.activated_analysis:
                    self.analyze(compressed)
                x = np.asarray(
                    self.compression_model.decompress(**compressed))[0]
            if self.post_transform is not None:
                x = self.post_transform(x)
            batch.append(np.asarray(x, np.float32))
        return self.classifier.logits(np.stack(batch))


@register_wrapper
class CodecFeatureCompressionClassifier(AnalyzerHolder):
    """Split the classifier; codec round-trip on the intermediate feature
    (reference `wrapper.py:138-193`, the feature-compression family:
    JPEG/WebP on the ResNet layer2 output). Head and tail are separately
    jitted programs; the codec runs on host between them."""

    def __init__(self, classifier_module, classifier_variables,
                 split_layer='layer2', compression_transform=None,
                 decompression_transform=None, analysis_config=None,
                 **kwargs):
        super().__init__((analysis_config or {}).get('analyzer_configs', []))
        self.module = classifier_module
        self.variables = classifier_variables
        self.split_layer = split_layer
        self.compress = _build_transform(compression_transform)
        self.decompress = _build_transform(decompression_transform)
        sl = split_layer
        self._head = jax.jit(lambda v, x: self.module.apply(
            v, x, sl, method=lambda m, x, s: m.forward_until(x, s)))
        self._tail = jax.jit(lambda v, z: self.module.apply(
            v, z, sl, method=lambda m, z, s: m.forward_from(z, s)))

    def __call__(self, x):
        feature = np.asarray(self._head(self.variables,
                                        jnp.asarray(x, jnp.float32)))
        out = []
        for f in feature:
            if self.compress is not None:
                comp = self.compress(f)
                if isinstance(comp, tuple):
                    comp, file_size = comp
                    self.analyze(file_size)
                f = self.decompress(comp) if self.decompress else comp
            out.append(np.asarray(f, np.float32))
        return self._tail(self.variables, jnp.asarray(np.stack(out)))


@register_wrapper
class EntropicClassifier(SplitClassifierRuntime):
    """Split classifier with an EntropyBottleneckLayer at a configurable
    split point (reference `wrapper.py:196-264`, the fine-tuning family).
    Wraps an `EntropicClassifierModule` (models/entropic.py)."""

    def __init__(self, module, variables, analyzer_configs=None, **kwargs):
        super().__init__(module, variables, analyzer_configs)


@register_wrapper
class SplitClassifier(SplitClassifierRuntime):
    """Naive split + tensor quantizer pair (reference `wrapper.py:267-319`):
    the SimpleBottleneck deploy path with FP16/INT8 quantization as the
    'compression'."""

    def __init__(self, module, variables, analyzer_configs=None,
                 compressor=None, decompressor=None, **kwargs):
        super().__init__(module, variables, analyzer_configs)
        self.compressor = _build_transform(compressor)
        self.decompressor = _build_transform(decompressor)
        self._enc = jax.jit(lambda v, x: self.module.apply(
            v, x, method=lambda m, x: m.bottleneck_layer.encode_latent(x)))
        self._dec = jax.jit(lambda v, z: self.module.apply(
            v, z, method=lambda m, z: m.forward_tail(
                m.bottleneck_layer.decode_latent(z))))

    def __call__(self, x, rng=None):
        if self.training:
            return super().__call__(x, rng)
        z = np.asarray(self._enc(self.variables, x))
        compressed = self.compressor(z) if self.compressor else z
        self.analyze(compressed)
        z = self.decompressor(compressed) if self.decompressor else compressed
        return self._dec(self.variables, jnp.asarray(z, jnp.float32))


def wrap_model(wrapper_model_config, model, model_variables, **kwargs):
    """Instantiate a wrapper by config key (reference `wrapper.py:322-339`)."""
    key = wrapper_model_config['key']
    cls = registry_get('wrapper', key)
    return cls(model, model_variables,
               **wrapper_model_config.get('kwargs', {}), **kwargs)


def get_wrapped_classification_model(wrapper_model_config, **kwargs):
    """Build base classifier + wrap (reference `wrapper.py:342-368`). A
    `compression_model` block builds a neural image codec from the zoo
    (reference `registry.py:83-105`)."""
    model_config = wrapper_model_config.get('classification_model',
                                            wrapper_model_config.get('model'))
    module = load_classification_model(model_config)
    from ..train.engine import init_model
    variables = init_model(module, init_kwargs={'train': False})
    cm_cfg = wrapper_model_config.get('compression_model')
    if cm_cfg is not None and 'compression_model' not in kwargs:
        from .registry import get_compression_model
        kwargs['compression_model'] = get_compression_model(cm_cfg)
    return wrap_model(wrapper_model_config, module, variables, **kwargs)
