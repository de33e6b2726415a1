"""Corpus hint-path resolution (r4 advisor guard): every criterion
module_path (student/teacher hints, entropy paths) in trainable configs
must resolve against the model's ACTUAL sown io key space, and every
frozen_modules / module_wise prefix against the real param tree.

Key spaces are extracted with `jax.eval_shape` over `init_with_output`
(pure tracing, no compute, no device buffers), exactly mirroring how
`train/box.py` builds the io_dict (flattened 'intermediates' + 'entropy'
collections + 'output' / 'output.<k>'). This is the CI guard for the class
of breakage the r4 advisor found: the hybrid-ViT teacher's sown stages were
renumbered and ~12 entropic-student configs silently paired mismatched (or
nonexistent) hint keys — `test_config_corpus` only builds criterion
*objects*, so nothing caught it.

One fast-rep test per hint family (resnet/regnet/hybrid-vit ES + VOC seg
ES) keeps failures readable; the corpus test sweeps every trainable
classification/seg/det config (structural dedup keeps it ~35 s).
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

import sc2bench_tpu.models  # noqa: F401  (populate registries)
from sc2bench_tpu.config import load_config, train_stage_configs
from sc2bench_tpu.registry import get as registry_get
from sc2bench_tpu.train.box import flatten_io

REPO = Path(__file__).resolve().parents[1]
CFG = REPO / 'configs'

# (io key space, param path set) per structural model signature
_CACHE = {}


def _signature(mc):
    """Structural dedup key: kwargs with numeric leaves stripped — sown key
    spaces depend on architecture topology (string/bool choices), not on
    channel counts / betas, so bq1ch..bq12ch and all betas share a trace."""
    def strip(v):
        if isinstance(v, dict):
            return tuple(sorted((k, strip(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(strip(x) for x in v)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return '<num>'
        return v
    return (mc['key'], strip(mc.get('kwargs', {})))


def _param_paths(tree, prefix=''):
    out = set()
    if isinstance(tree, dict):
        for k, v in tree.items():
            p = f'{prefix}.{k}' if prefix else str(k)
            out.add(p)
            out.update(_param_paths(v, p))
    return out


def _trace_model(mc, task, role):
    """(io key set, param path set) for a model config via eval_shape."""
    sig = (task, role) + _signature(mc)
    if sig in _CACHE:
        return _CACHE[sig]
    if task == 'cls':
        from sc2bench_tpu.models.registry import load_classification_model
        module = load_classification_model(mc)
    else:
        module = registry_get('model', mc['key'])(**mc.get('kwargs', {}))
    size = {'cls': (224, 224), 'seg': (512, 512), 'det': (320, 320)}[task]
    kwargs = {'train': False} if role == 'teacher' and task == 'cls' \
        else {'mode': 'train'}

    def init(x):
        return module.init_with_output(
            {'params': jax.random.key(0), 'noise': jax.random.key(1)},
            x, mutable=True, **kwargs)

    out, variables = jax.eval_shape(
        init, jax.ShapeDtypeStruct((1, *size, 3), jnp.float32))
    io = set(flatten_io(variables.get('intermediates', {})))
    io |= set(flatten_io(variables.get('entropy', {})))
    io.add('output')
    io.add('.')
    if isinstance(out, dict):
        io |= {f'output.{k}' for k in out}
    _CACHE[sig] = (io, _param_paths(variables.get('params', {})))
    return _CACHE[sig]


def _criterion_paths(crit):
    """(student paths, teacher paths) referenced by a criterion config."""
    student, teacher = set(), set()
    kw = crit.get('kwargs', {})
    for name, sub in kw.get('sub_terms', {}).items():
        s, t = _criterion_paths(sub['criterion'])
        student |= s
        teacher |= t
    for key, bucket in (('student_module_path', student),
                        ('teacher_module_path', teacher),
                        ('entropy_module_path', student),
                        ('module_path', student),
                        ('aux_module_path', student)):
        if kw.get(key):
            bucket.add(kw[key])
    return student, teacher


def _prefix_resolves(prefix, param_paths):
    # the real matcher the optimizer labeling uses (incl. segment globs)
    from sc2bench_tpu.train.optim import _matches
    return any(_matches(p, prefix) for p in param_paths)


def check_config(rel):
    config = load_config(CFG / rel)
    models_config = config.get('models', {})
    if 'wrapper' in models_config or 'train' not in config:
        pytest.skip('test-only config (no train stages)')
    task = ('det' if rel.startswith('coco')
            else 'seg' if rel.startswith('pascal') else 'cls')
    sm_cfg = models_config.get('student_model', models_config.get('model'))
    s_io, s_params = _trace_model(sm_cfg, task, 'student')
    t_io = None
    if 'teacher_model' in models_config:
        t_io, _ = _trace_model(models_config['teacher_model'], task,
                               'teacher')
    for stage in train_stage_configs(config['train']):
        if 'criterion' in stage:
            s_paths, t_paths = _criterion_paths(stage['criterion'])
            missing = {p for p in s_paths if p not in s_io}
            assert not missing, \
                f'{rel}: student hint paths {sorted(missing)} not in sown ' \
                f'io keys {sorted(k for k in s_io if "out" in k)[:20]}'
            if t_paths:
                assert t_io is not None, f'{rel}: teacher paths, no teacher'
                missing = {p for p in t_paths if p not in t_io}
                assert not missing, \
                    f'{rel}: teacher hint paths {sorted(missing)} not in ' \
                    f'{sorted(k for k in t_io if "out" in k)[:20]}'
        for prefix in stage.get('frozen_modules', []):
            assert _prefix_resolves(prefix, s_params), \
                f'{rel}: frozen prefix {prefix!r} matches no param path'
        for entry in stage.get('optimizer', {}).get('module_wise_kwargs',
                                                    []):
            assert _prefix_resolves(entry['module'], s_params), \
                f'{rel}: module_wise prefix {entry["module"]!r} unresolved'


FAST_REPS = [
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splitable_resnet50-fp-beta0.08_from_resnet50.yaml',
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splitable_regnety6.4gf-mshp-beta4.48_from_regnety6.4gf.yaml',
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splitable_hybrid_vit_small_r26_s32_224-fp-beta20.48_'
    'from_hybrid_vit_small_r26_s32_224.yaml',
    'pascal_voc2012/supervised_compression/entropic_student/'
    'deeplabv3_splittable_resnet50-fp-beta0.16_from_deeplabv3_resnet50.yaml',
]


@pytest.mark.parametrize('rel', FAST_REPS)
def test_hint_paths_resolve_fast_reps(rel):
    check_config(rel)


def _trainable_rels():
    rels = []
    for p in sorted(CFG.rglob('*.yaml')):
        rel = str(p.relative_to(CFG))
        if rel in FAST_REPS or rel.startswith('sample/'):
            continue
        config = load_config(p)
        if 'train' in config and 'wrapper' not in config.get('models', {}):
            rels.append(rel)
    return rels


@pytest.mark.parametrize('rel', _trainable_rels())
def test_hint_paths_resolve_corpus(rel):
    check_config(rel)
