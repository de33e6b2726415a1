"""Training losses: rate (bpp) loss and the config-composed weighted-sum
criterion used by the distillation engine.

Reference contracts: `BppLoss` (`/root/reference/sc2bench/loss.py:6-37`) reads
the entropy module's hooked output from the student io_dict; the criterion is
torchdistill's `WeightedSumLoss` over config `sub_terms`
(SURVEY.md §2.3, config `:142-229`). Here the io_dict is a pytree of captured
intermediates, so every term is a pure function (io_dicts, targets) -> scalar.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

from .registry import register_loss, get as registry_get


def _lookup_io(io_dict, path: str, key: str = 'output'):
    entry = io_dict[path]
    if isinstance(entry, dict):
        return entry[key]
    return entry


@register_loss
class BppLoss:
    """Bit-per-pixel rate term: -sum(log2(likelihoods)) with 'sum',
    'batchmean' or 'mean' (÷ n·h·w) reduction (reference `loss.py:20-37`).

    The entropy module's captured output is `(y_hat, likelihoods)` with NHWC
    layout (reference is NCHW; pixel counting is layout-corrected here).
    """

    def __init__(self, entropy_module_path, reduction='mean'):
        self.entropy_module_path = entropy_module_path
        self.reduction = reduction

    def __call__(self, student_io_dict, teacher_io_dict=None, targets=None,
                 **kwargs):
        output = _lookup_io(student_io_dict, self.entropy_module_path)
        intermediate_features, likelihoods = output
        n, h, w = intermediate_features.shape[:3]
        num_pixels = n * h * w
        nll = -jnp.sum(jnp.log2(likelihoods))
        if self.reduction == 'sum':
            return nll
        if self.reduction == 'batchmean':
            return nll / n
        return nll / num_pixels


@register_loss
class MSELoss:
    """Hint (feature-matching) loss between student and teacher intermediate
    activations, the per-layer term of the GHND/Entropic-Student stage-1
    recipe (reference config `:142-229`)."""

    def __init__(self, student_module_path, teacher_module_path,
                 reduction='sum', student_io='output', teacher_io='output'):
        self.student_module_path = student_module_path
        self.teacher_module_path = teacher_module_path
        self.reduction = reduction
        self.student_io = student_io
        self.teacher_io = teacher_io

    def __call__(self, student_io_dict, teacher_io_dict, targets=None,
                 **kwargs):
        s = _lookup_io(student_io_dict, self.student_module_path,
                       self.student_io)
        t = _lookup_io(teacher_io_dict, self.teacher_module_path,
                       self.teacher_io)
        if isinstance(s, tuple):
            s = s[0]
        if isinstance(t, tuple):
            t = t[0]
        diff = (s - t) ** 2
        if self.reduction == 'sum':
            return jnp.sum(diff)
        if self.reduction == 'batchmean':
            return jnp.sum(diff) / s.shape[0]
        return jnp.mean(diff)


@register_loss
class CrossEntropyLoss:
    """Standard softmax cross entropy on the model output logits."""

    def __init__(self, module_path='.', reduction='mean', label_smoothing=0.0):
        self.module_path = module_path
        self.reduction = reduction
        self.label_smoothing = label_smoothing

    def __call__(self, student_io_dict, teacher_io_dict=None, targets=None,
                 **kwargs):
        logits = _lookup_io(student_io_dict, self.module_path)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets)
        if self.label_smoothing:
            num_classes = logits.shape[-1]
            smooth = optax.softmax_cross_entropy(
                logits, jnp.full_like(logits, 1.0 / num_classes))
            losses = (1 - self.label_smoothing) * losses \
                + self.label_smoothing * smooth
        return jnp.sum(losses) if self.reduction == 'sum' else jnp.mean(losses)


@register_loss
class KDLoss:
    """Hinton knowledge distillation: alpha * T^2 * KL(student || teacher)
    + (1 - alpha) * CE(student, labels) — the stage-2 Entropic Student loss
    (reference config `:280-295`)."""

    def __init__(self, student_module_path='.', teacher_module_path='.',
                 temperature=1.0, alpha=0.5, reduction='batchmean', **kwargs):
        self.student_module_path = student_module_path
        self.teacher_module_path = teacher_module_path
        self.temperature = temperature
        self.alpha = alpha
        self.reduction = reduction

    def __call__(self, student_io_dict, teacher_io_dict, targets=None,
                 **kwargs):
        import jax
        s_logits = _lookup_io(student_io_dict, self.student_module_path)
        t_logits = _lookup_io(teacher_io_dict, self.teacher_module_path)
        T = self.temperature
        log_p = jax.nn.log_softmax(s_logits / T, axis=-1)
        q = jax.nn.softmax(t_logits / T, axis=-1)
        # KL(q || p) summed over classes, batch-mean — torch KLDivLoss
        # ('batchmean') semantics used by the reference recipe.
        kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-30)) - log_p), axis=-1)
        soft = jnp.mean(kl)
        hard = 0.0
        if targets is not None and self.alpha < 1.0:
            hard = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                s_logits, targets))
        return self.alpha * (T ** 2) * soft + (1 - self.alpha) * hard


@register_loss
class SegCrossEntropyLoss:
    """Pixel CE with ignore_index=255 over seg output dict(s) — the
    reference's seg criterion (torch `cross_entropy(ignore_index=255)` with
    aux weighted 0.5)."""

    def __init__(self, module_path='output', aux_module_path=None,
                 aux_weight=0.5, ignore_index=255):
        self.module_path = module_path
        self.aux_module_path = aux_module_path
        self.aux_weight = aux_weight
        self.ignore_index = ignore_index

    def _ce(self, logits, targets):
        import jax
        valid = targets != self.ignore_index
        safe_t = jnp.where(valid, targets, 0)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(log_probs, safe_t[..., None],
                                  axis=-1)[..., 0]
        return jnp.sum(jnp.where(valid, ce, 0.0)) \
            / jnp.maximum(jnp.sum(valid), 1)

    def __call__(self, student_io_dict, teacher_io_dict=None, targets=None,
                 **kwargs):
        loss = self._ce(_lookup_io(student_io_dict, self.module_path),
                        targets)
        if self.aux_module_path and self.aux_module_path in student_io_dict:
            loss = loss + self.aux_weight * self._ce(
                _lookup_io(student_io_dict, self.aux_module_path), targets)
        return loss


class WeightedSumLoss:
    """Σ weight_i · term_i over config `sub_terms`, the criterion contract of
    the reference's training engine (SURVEY.md §7 design stance)."""

    def __init__(self, sub_terms: dict):
        self.terms = {}
        for name, cfg in sub_terms.items():
            criterion_cfg = cfg['criterion']
            cls = registry_get('loss', criterion_cfg['key'])
            self.terms[name] = (cls(**criterion_cfg.get('kwargs', {})),
                                float(cfg.get('weight', 1.0)))

    def __call__(self, student_io_dict, teacher_io_dict=None, targets=None,
                 **kwargs):
        total = 0.0
        detail = {}
        for name, (term, weight) in self.terms.items():
            value = term(student_io_dict, teacher_io_dict, targets, **kwargs)
            detail[name] = value
            total = total + weight * value
        return total, detail


def build_criterion(criterion_config) -> WeightedSumLoss:
    key = criterion_config.get('key', 'WeightedSumLoss')
    if key != 'WeightedSumLoss':
        cls = registry_get('loss', key)
        single = cls(**criterion_config.get('kwargs', {}))

        def fn(s, t=None, y=None, **kw):
            v = single(s, t, y, **kw)
            return v, {key: v}
        return fn
    return WeightedSumLoss(criterion_config['kwargs']['sub_terms'])
