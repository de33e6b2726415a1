"""Compressed-size and model-size analysis.

Port surface of `/root/reference/sc2bench/analysis.py` with identical
byte-accounting semantics: data size = pickled size of the compressed object
(`analysis.py:126-134`), encoder size = dtype-bits × param-count split by
parameter-path prefix (`analysis.py:202-264`). The analyzers are host-side
objects — they sit outside jit, fed by the eval loop after device→host
transfer of bitstream lengths.
"""
from __future__ import annotations

import logging
import pickle
import sys

import jax.numpy as jnp
import numpy as np

from .registry import register_analyzer, get as registry_get

logger = logging.getLogger(__name__)


def get_binary_object_size(obj, unit_size: int = 1024) -> float:
    """Pickled size of an arbitrary object (reference: torchdistill
    `get_binary_object_size`)."""
    return sys.getsizeof(pickle.dumps(obj)) / unit_size


class BaseAnalyzer:
    def analyze(self, *args, **kwargs):
        raise NotImplementedError()

    def summarize(self):
        raise NotImplementedError()

    def clear(self):
        raise NotImplementedError()


@register_analyzer
class FileSizeAnalyzer(BaseAnalyzer):
    """Measures compressed-object size per sample; summarize() reports
    mean/std, matching the reference log line `analysis.py:141-142`."""

    UNIT_DICT = {'B': 1, 'KB': 1024, 'MB': 1024 * 1024}

    def __init__(self, unit='KB', **kwargs):
        self.unit = unit
        self.unit_size = self.UNIT_DICT[unit]
        self.kwargs = kwargs
        self.file_size_list = []

    def analyze(self, compressed_obj):
        self.file_size_list.append(
            get_binary_object_size(compressed_obj, unit_size=self.unit_size))

    def summarize(self):
        file_sizes = np.array(self.file_size_list)
        logger.info('Bottleneck size [%s]: mean %s std %s for %s samples',
                    self.unit, file_sizes.mean(), file_sizes.std(),
                    len(file_sizes))
        return {'mean': float(file_sizes.mean()) if len(file_sizes) else 0.0,
                'std': float(file_sizes.std()) if len(file_sizes) else 0.0,
                'num_samples': len(file_sizes), 'unit': self.unit}

    def clear(self):
        self.file_size_list.clear()


@register_analyzer
class FileSizeAccumulator(FileSizeAnalyzer):
    """Accumulates pre-computed sizes (bytes) instead of pickling."""

    def __init__(self, unit='KB', **kwargs):
        super().__init__(unit=unit, **kwargs)

    def analyze(self, file_size):
        self.file_size_list.append(file_size / self.unit_size)


def get_analyzer(cls_name, **kwargs):
    try:
        return registry_get('analyzer', cls_name)(**kwargs)
    except KeyError:
        return None


class AnalyzerHolder:
    """Mixin/state holder giving model runtimes the reference's analyzable
    surface: activate_analysis / deactivate_analysis / analyze / summarize /
    clear_analysis (`analysis.py:24-80`)."""

    def __init__(self, analyzer_configs=None):
        analyzer_configs = analyzer_configs or []
        self.analyzers = [
            get_analyzer(cfg['key'], **cfg.get('kwargs', {}))
            for cfg in analyzer_configs]
        self.activated_analysis = False

    def activate_analysis(self):
        self.activated_analysis = True

    def deactivate_analysis(self):
        self.activated_analysis = False

    def analyze(self, compressed_obj):
        if not self.activated_analysis:
            return
        for analyzer in self.analyzers:
            analyzer.analyze(compressed_obj)

    def summarize(self):
        return [analyzer.summarize() for analyzer in self.analyzers]

    def clear_analysis(self):
        for analyzer in self.analyzers:
            analyzer.clear()


def check_if_analyzable(module) -> bool:
    return isinstance(module, AnalyzerHolder) or (
        hasattr(module, 'activate_analysis') and hasattr(module, 'analyze'))


_DTYPE_BITS = {
    'int64': 64, 'float64': 64,
    'int32': 32, 'float32': 32, 'uint32': 32,
    'int16': 16, 'float16': 16, 'bfloat16': 16, 'uint16': 16,
    'int8': 8, 'uint8': 8,
    'bool': 2,
}


def _flatten_params(tree, prefix=''):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_params(v, f'{prefix}{k}.' if prefix or k else k)
    else:
        yield prefix.rstrip('.'), tree


def analyze_model_size(params, encoder_paths=None, additional_rest_paths=None,
                       ignores_dtype_error=True):
    """Bits of parameters for the whole model / encoder / rest, split by
    dotted-path prefix (reference semantics `analysis.py:202-264`).

    `params` is a (nested) pytree dict of arrays, e.g. flax `params`.
    """
    encoder_path_set = set(encoder_paths or [])
    additional_rest_path_set = set(additional_rest_paths or [])
    model_size = encoder_size = rest_size = 0
    for path, v in _flatten_params(params):
        v = jnp.asarray(v)
        param_count = int(np.prod(v.shape)) if v.ndim else 1
        dtype_name = str(v.dtype)
        if dtype_name not in _DTYPE_BITS:
            msg = f'For {path}, dtype `{dtype_name}` is not expected'
            if ignores_dtype_error:
                logger.warning(msg)
                continue
            raise TypeError(msg)
        param_size = _DTYPE_BITS[dtype_name] * param_count
        model_size += param_size
        matched = False
        for encoder_path in encoder_path_set:
            if path.startswith(encoder_path):
                encoder_size += param_size
                if path in additional_rest_path_set:
                    rest_size += param_size
                matched = True
                break
        if not matched:
            rest_size += param_size
    return {'model': model_size, 'encoder': encoder_size, 'rest': rest_size}
