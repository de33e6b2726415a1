"""Config-corpus smoke tests: the tree matches the reference 1:1, every
YAML parses, and one config per family resolves its model/wrapper builders
against the registries (shape-only, no device work)."""
from pathlib import Path

import pytest

import sc2bench_tpu.models  # noqa: F401  (populate registries)
import sc2bench_tpu.transforms  # noqa: F401
from sc2bench_tpu.config import load_config, train_stage_configs
from sc2bench_tpu.registry import lookup

REPO = Path(__file__).resolve().parents[1]
CFG = REPO / 'configs'
REF_CFG = Path('/root/reference/configs')


def test_all_configs_parse():
    paths = list(CFG.rglob('*.yaml'))
    assert len(paths) >= 189
    for p in paths:
        config = load_config(p)
        assert isinstance(config, dict)


@pytest.mark.skipif(not REF_CFG.exists(), reason='reference tree absent')
def test_tree_matches_reference_one_to_one():
    ref = {str(p.relative_to(REF_CFG)) for p in REF_CFG.rglob('*.yaml')}
    ours = {str(p.relative_to(CFG)) for p in CFG.rglob('*.yaml')
            if not str(p.relative_to(CFG)).startswith('sample/')}
    assert ref - ours == set(), f'missing: {sorted(ref - ours)[:10]}'
    assert ours - ref == set(), f'extra: {sorted(ours - ref)[:10]}'


def _resolve_models(config):
    models_config = config['models']
    for key in ('teacher_model', 'student_model', 'model'):
        if key not in models_config:
            continue
        mc = models_config[key]
        name = mc['key']
        from sc2bench_tpu.models.resnet import RESNET_BUILDERS
        builder = RESNET_BUILDERS.get(name) or lookup('model', name)
        assert builder is not None, name
        module = builder(**{k: v for k, v in mc.get('kwargs', {}).items()})
        assert module is not None
    if 'wrapper' in models_config:
        wc = models_config['wrapper']
        assert lookup('wrapper', wc['key']) is not None, wc['key']
        inner = wc.get('classification_model') or wc.get('detection_model') \
            or wc.get('segmentation_model') or wc.get('model')
        if inner is not None:
            from sc2bench_tpu.models.resnet import RESNET_BUILDERS
            assert (RESNET_BUILDERS.get(inner['key'])
                    or lookup('model', inner['key'])) is not None, inner['key']
        codec_cfg = wc.get('kwargs', {}).get(
            'codec_encoder_decoder', wc.get('kwargs', {}).get('codec_config'))
        if codec_cfg:
            assert lookup('transform', codec_cfg['key']) is not None
    if 'train' in config:
        from sc2bench_tpu.loss import build_criterion
        from sc2bench_tpu.train.optim import build_optimizer
        for stage in train_stage_configs(config['train']):
            assert 'optimizer' in stage or 'criterion' in stage
            if 'criterion' in stage:
                assert build_criterion(stage['criterion']) is not None
            if 'optimizer' in stage:
                assert build_optimizer(stage['optimizer'],
                                       stage.get('scheduler')) is not None


# one representative per family directory (all 14 reference dirs)
@pytest.mark.parametrize('rel', [
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splitable_resnet50-fp-beta0.08_from_resnet50.yaml',
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splitable_regnety6.4gf-mshp-beta4.48_from_regnety6.4gf.yaml',
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splitable_hybrid_vit_small_r26_s32_224-fp-beta20.48_'
    'from_hybrid_vit_small_r26_s32_224.yaml',
    'ilsvrc2012/supervised_compression/end-to-end/'
    'splitable_resnet50-fp-beta1.024e-7.yaml',
    'ilsvrc2012/supervised_compression/ghnd-bq/'
    'resnet50-bq12ch_from_resnet50.yaml',
    'ilsvrc2012/supervised_compression/fine-tuning/'
    'resnet50-eb_after_layer1-beta1.024e-7.yaml',
    'ilsvrc2012/input_compression/jpeg-resnet50.yaml',
    'ilsvrc2012/input_compression/jpeg-tf_efficientnet_l2_ns_475.yaml',
    'ilsvrc2012/input_compression/factorized_prior-resnet50.yaml',
    'ilsvrc2012/feature_compression/jpeg-resnet50.yaml',
    'coco2017/supervised_compression/entropic_student/'
    'faster_rcnn_splittable_resnet50-fp-beta0.08_fpn_'
    'from_faster_rcnn_resnet50_fpn.yaml',
    'coco2017/supervised_compression/end-to-end/'
    'faster_rcnn_splittable_resnet50-fp-beta1.28e-8_fpn.yaml',
    'coco2017/supervised_compression/ghnd-bq/'
    'faster_rcnn_resnet50-bq1ch_fpn_from_faster_rcnn_resnet50_fpn.yaml',
    'coco2017/input_compression/jpeg-faster_rcnn_resnet50_fpn.yaml',
    'coco2017/input_compression/'
    'mean_scale_hyperprior-faster_rcnn_resnet50_fpn.yaml',
    'pascal_voc2012/supervised_compression/entropic_student/'
    'deeplabv3_splittable_resnet50-fp-beta0.16_from_deeplabv3_resnet50.yaml',
    'pascal_voc2012/supervised_compression/end-to-end/'
    'deeplabv3_splittable_resnet50-fp-beta1.28e-8.yaml',
    'pascal_voc2012/supervised_compression/ghnd-bq/'
    'deeplabv3_resnet50-bq1ch_from_deeplabv3_resnet50.yaml',
    'pascal_voc2012/input_compression/jpeg-deeplabv3_resnet50.yaml',
    'pascal_voc2012/input_compression/'
    'factorized_prior-deeplabv3_resnet101.yaml',
])
def test_family_configs_resolve_builders(rel):
    _resolve_models(load_config(CFG / rel))


def _all_config_rels():
    return sorted(str(p.relative_to(CFG)) for p in CFG.rglob('*.yaml'))


@pytest.mark.parametrize('rel', _all_config_rels())
def test_every_config_resolves(rel):
    """Corpus-wide resolution (VERDICT r3 #6): every YAML's model/wrapper
    builders construct with the config kwargs, every stage's criterion and
    optimizer/scheduler build — any kwargs drift anywhere fails CI.
    Shape-only: no params are initialized, no device work."""
    _resolve_models(load_config(CFG / rel))


def test_input_compression_config_wrapper_resolves():
    config = load_config(
        CFG / 'ilsvrc2012/input_compression/jpeg-resnet50.yaml')
    wrapper_cfg = config['models']['wrapper']
    assert lookup('wrapper', wrapper_cfg['key']) is not None
    codec_cfg = wrapper_cfg['kwargs']['codec_encoder_decoder']
    assert lookup('transform', codec_cfg['key']) is not None
    assert 'sweep' in config  # quality sweep metadata for the driver script
