"""Config-corpus smoke tests: every generated YAML parses, and one config
per family resolves its model builders against the registries (shape-only,
no device work)."""
from pathlib import Path

import pytest

import sc2bench_tpu.models  # noqa: F401  (populate registries)
from sc2bench_tpu.config import load_config, train_stage_configs
from sc2bench_tpu.registry import lookup

REPO = Path(__file__).resolve().parents[1]
CFG = REPO / 'configs'


def test_all_configs_parse():
    paths = list(CFG.rglob('*.yaml'))
    assert len(paths) >= 100
    for p in paths:
        config = load_config(p)
        assert isinstance(config, dict)


@pytest.mark.parametrize('rel', [
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splittable_resnet50-fp-beta0.08_from_resnet50.yaml',
    'ilsvrc2012/supervised_compression/entropic_student/'
    'splittable_resnet101-mshp-beta5.12_from_resnet101.yaml',
    'ilsvrc2012/supervised_compression/end-to-end/'
    'splittable_resnet50-fp-beta1.024e-07.yaml',
    'ilsvrc2012/supervised_compression/ghnd-bq/'
    'resnet50-bq12ch_from_resnet50.yaml',
    'ilsvrc2012/supervised_compression/fine-tuning/'
    'resnet50-eb_after_layer1-beta1.024e-07.yaml',
    'coco2017/supervised_compression/entropic_student/'
    'faster_rcnn_splittable_resnet50-fp-beta0.08_fpn.yaml',
    'pascal_voc2012/supervised_compression/entropic_student/'
    'deeplabv3_splittable_resnet50-fp-beta0.16.yaml',
])
def test_family_configs_resolve_builders(rel):
    config = load_config(CFG / rel)
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
    # stage configs must be orderable and carry optimizer + criterion
    if 'train' in config:
        for stage in train_stage_configs(config['train']):
            assert 'optimizer' in stage or 'criterion' in stage


def test_input_compression_config_wrapper_resolves():
    config = load_config(
        CFG / 'ilsvrc2012/input_compression/jpeg-resnet50.yaml')
    wrapper_cfg = config['models']['wrapper']
    assert lookup('wrapper', wrapper_cfg['key']) is not None
    codec_cfg = wrapper_cfg['kwargs']['codec_encoder_decoder']
    assert lookup('transform', codec_cfg['key']) is not None
    assert 'sweep' in config  # quality sweep metadata for the driver script
