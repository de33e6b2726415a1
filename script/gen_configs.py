#!/usr/bin/env python
"""Generate the experiment-config corpus — 1:1 with the reference tree.

Every file under `/root/reference/configs/` has a same-named counterpart
here (189 yamls; filenames match exactly, including the reference's
'splitable_' spelling), with contents expressed in this framework's schema
(SURVEY.md §5.6): `dependencies`, `models{teacher_model,student_model|model|
wrapper}`, `train{stage1,stage2|flat}`, `test`, plus `sweep` metadata for
the quality-sweep driver scripts. Run from the repo root:

    python script/gen_configs.py
"""
import shutil
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]
CFG = REPO / 'configs'

# ---------------------------------------------------------------------------
# grids (BASELINE.md; reference config filenames under /root/reference/configs)
# ---------------------------------------------------------------------------
ES_FP_BETAS = [0.08, 0.16, 0.32, 0.64, 1.28, 2.56, 5.12]
E2E_BETAS = ['1.28e-8', '1.024e-7', '2.048e-7', '8.192e-7', '3.2768e-6']
GHND_CHANNELS = [1, 2, 3, 6, 9, 12]
# per-split fine-tuning β grids (reference fine-tuning dir, 38 yamls)
FT_GRID = {
    'avgpool': ['1.0e-1', '1.0e-10', '1.0e-15', '1.0e-2', '1.0e-4',
                '6.5536e-6', '8.0e-10'],
    'layer1': ['1.024e-7', '1.0e-15', '1.0e-4', '1.0e-5', '1.28e-8',
               '5.0e-11', '6.5536e-6', '8.0e-10', '8.192e-7'],
    'layer2': ['1.0e-10', '1.0e-15', '1.0e-4', '1.0e-5', '1.0e-6', '1.0e-8'],
    'layer3': ['1.0e-10', '1.0e-15', '1.0e-4', '1.0e-5', '1.0e-6', '1.0e-8',
               '5.0e-5'],
    'layer4': ['1.0e-10', '1.0e-15', '1.0e-3', '1.0e-4', '1.0e-5', '1.0e-6',
               '1.0e-8', '5.0e-4', '5.0e-5'],
}
JPEG_QUALITIES = list(range(10, 101, 10))
BPG_QUALITIES = list(range(5, 51, 5))
NEURAL_QUALITIES = list(range(1, 9))
NEURAL_FAMILIES = ['factorized_prior', 'scale_hyperprior',
                   'mean_scale_hyperprior',
                   'joint_autoregressive_hierarchical_prior']

# Entropic-Student ilsvrc2012 grid: one entry per reference backbone sweep.
# (file_stem, from_stem) reproduce the reference filenames exactly.
ES_ILSVRC = {
    'resnet50': {
        'file_stem': 'splitable_resnet50', 'from_stem': 'resnet50',
        'teacher_key': 'resnet50', 'fp': ES_FP_BETAS,
        'mshp': [0.08, 0.16, 0.32, 0.64, 1.28, 2.56, 3.84],
    },
    'resnet101': {
        'file_stem': 'splitable_resnet101', 'from_stem': 'resnet101',
        'teacher_key': 'resnet101', 'fp': ES_FP_BETAS,
        'mshp': [0.08, 0.16, 0.32, 0.64, 1.28, 2.56],
    },
    'regnety6.4gf': {
        'file_stem': 'splitable_regnety6.4gf', 'from_stem': 'regnety6.4gf',
        'teacher_key': 'regnety_064',
        'fp': ES_FP_BETAS + [7.68],
        'mshp': [0.08, 0.16, 0.32, 0.64, 1.28, 2.56, 4.48],
    },
    'hybrid_vit_small_r26_s32_224': {
        'file_stem': 'splitable_hybrid_vit_small_r26_s32_224',
        'from_stem': 'hybrid_vit_small_r26_s32_224',
        'teacher_key': 'hybrid_vit_small_r26_s32_224',
        'fp': [0.16, 0.32, 0.64, 1.28, 2.56, 5.12, 10.24, 15.36, 20.48],
        'mshp': [0.16, 0.32, 0.64, 1.28, 2.56, 5.12, 10.24, 15.36, 20.48],
    },
}


def dump(path, config):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, 'w') as f:
        yaml.safe_dump(config, f, sort_keys=False)


# ---------------------------------------------------------------------------
# dataset loader blocks
# ---------------------------------------------------------------------------
def ilsvrc_loaders(train_bs=256):
    return {
        'train_data_loader': {
            'dataset': {'key': 'ImageFolderDataset',
                        'kwargs': {'root': '~/datasets/ilsvrc2012/train'}},
            'batch_size': train_bs, 'shuffle': True, 'drop_last': True},
        'val_data_loader': {
            'dataset': {'key': 'ImageFolderDataset',
                        'kwargs': {'root': '~/datasets/ilsvrc2012/val'}},
            'batch_size': 32},
    }


def ilsvrc_test(test_bs=1):
    return {'test_data_loader': {
        'dataset': {'key': 'ImageFolderDataset',
                    'kwargs': {'root': '~/datasets/ilsvrc2012/val'}},
        'batch_size': test_bs}}


def coco_loader(split, bs, shuffle=False):
    return {
        'dataset': {'key': 'CocoDetectionDataset', 'kwargs': {
            'img_dir': f'~/datasets/coco2017/{split}2017',
            'ann_file_path': f'~/datasets/coco2017/annotations/'
                             f'instances_{split}2017.json'}},
        'batch_size': bs, 'shuffle': shuffle}


def voc_loader(split, bs, shuffle=False):
    return {
        'dataset': {'key': 'VOCSegmentationDataset', 'kwargs': {
            'root': '~/datasets/pascal_voc2012', 'image_set': split}},
        'batch_size': bs, 'shuffle': shuffle}


# ---------------------------------------------------------------------------
# training-stage blocks
# ---------------------------------------------------------------------------
def es_stage1(beta, hint_pairs, entropy_paths, epochs=10, frozen=()):
    """Stage-1 hint distillation + β·bpp (reference entropic-student yaml
    stage1, `:142-229`; MSHP has two rate terms, z + y, `:224-236`)."""
    sub_terms = {}
    for i, (sp, tp) in enumerate(hint_pairs, start=1):
        sub_terms[f'hint{i}'] = {
            'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': sp, 'teacher_module_path': tp,
                'reduction': 'sum'}}, 'weight': 1.0}
    for j, path in enumerate(entropy_paths):
        name = 'bpp' if len(entropy_paths) == 1 else f'bpp{j}'
        sub_terms[name] = {'criterion': {'key': 'BppLoss', 'kwargs': {
            'entropy_module_path': path,
            'reduction': 'batchmean'}}, 'weight': float(beta)}
    return {
        'num_epochs': epochs, 'epoch_to_update': epochs, 'train_bn': False,
        'frozen_modules': list(frozen),
        'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
        'scheduler': {'key': 'MultiStepLR',
                      'kwargs': {'milestones': [5, 8], 'gamma': 0.1}},
        'criterion': {'key': 'WeightedSumLoss',
                      'kwargs': {'sub_terms': sub_terms}},
    }


def es_frozen_stage2(kind):
    """Stage-2 frozen modules: encoder + entropy models stay fixed, the
    bottleneck DECODER keeps training with the tail (reference es yaml
    stage2 `frozen_modules`: fp freezes encoder+entropy_bottleneck; mshp
    freezes g_a/h_a/h_s/entropy_bottleneck/gaussian_conditional, leaving
    g_s trainable). Flax Sequential flattens named children to the parent
    scope, so the reference's `.encoder`/`.g_a` module boundaries are
    expressed as segment globs (train/optim._matches); the reference's
    `gaussian_conditional` entry is omitted — it holds no learnable
    parameters here (the scale table is built at update())."""
    if kind == 'mshp':
        return ['bottleneck_layer.g_a_*', 'bottleneck_layer.h_a_*',
                'bottleneck_layer.h_s_*',
                'bottleneck_layer.entropy_bottleneck']
    return ['bottleneck_layer.enc_*', 'bottleneck_layer.entropy_bottleneck']


def es_stage2(epochs=10, kind='fp'):
    return {
        'num_epochs': epochs, 'train_bn': True,
        'frozen_modules': es_frozen_stage2(kind),
        'optimizer': {'key': 'SGD', 'kwargs': {'lr': 0.001, 'momentum': 0.9,
                                               'weight_decay': 0.0005}},
        'scheduler': {'key': 'MultiStepLR',
                      'kwargs': {'milestones': [5], 'gamma': 0.1}},
        'criterion': {'key': 'KDLoss', 'kwargs': {
            'student_module_path': 'output',
            'teacher_module_path': 'output',
            'temperature': 1.0, 'alpha': 0.5}},
    }


def bottleneck_block(kind, backbone):
    """Bottleneck config per (fp|mshp, backbone family) with the reference's
    channel sizes (regnet/vit use bch 64 and family-specific decoders,
    reference yaml `:80-100`)."""
    if backbone in ('resnet50', 'resnet101'):
        kw = {'num_bottleneck_channels': 24, 'num_target_channels': 256}
    elif backbone == 'regnety6.4gf':
        if kind == 'fp':
            kw = {'num_bottleneck_channels': 64,
                  'encoder_channel_sizes': [3, 64, 64, 64],
                  'decoder_channel_sizes': [64, 288, 144, 144]}
        else:
            kw = {'num_bottleneck_channels': 64,
                  'g_a_channel_sizes': [3, 64, 64, 64],
                  'g_s_channel_sizes': [64, 288, 144, 144]}
    else:  # hybrid vit
        if kind == 'fp':
            kw = {'num_bottleneck_channels': 64,
                  'encoder_channel_sizes': [3, 64, 64, 64],
                  'decoder_channel_sizes': [64, 512, 256, 256]}
        else:
            kw = {'num_bottleneck_channels': 64,
                  'g_a_channel_sizes': [3, 64, 64, 64],
                  'g_s_channel_sizes': [64, 512, 256, 256]}
    key = ('FPBasedResNetBottleneck' if kind == 'fp'
           else 'MSHPBasedResNetBottleneck')
    return {'key': key, 'kwargs': kw}


def student_block(backbone, kind):
    bneck = bottleneck_block(kind, backbone)
    if backbone in ('resnet50', 'resnet101'):
        return {'key': 'splittable_resnet',
                'kwargs': {'num_classes': 1000, 'resnet_name': backbone,
                           'bottleneck_config': bneck}}
    if backbone == 'regnety6.4gf':
        return {'key': 'splittable_regnet',
                'kwargs': {'num_classes': 1000,
                           'regnet_name': 'regnety_064',
                           'bottleneck_config': bneck}}
    return {'key': 'splittable_hybrid_vit',
            'kwargs': {'num_classes': 1000, 'num_pruned_stages': 1,
                       'bottleneck_config': bneck}}


def hint_pairs(backbone):
    """(student, teacher) sown-key hint pairs + stage-1 frozen modules per
    family, mirroring the reference's forward_hook pairs and frozen lists
    exactly (resnet: reference es yaml `:135,170-226`; regnet: bottleneck
    pairs teacher `s1`, frozen s2-s4; hybrid vit: bottleneck pairs teacher
    `patch_embed.backbone.stages.0` = our teacher `stage0_out`, frozen =
    the pruned stages `patch_embed_pruned_stages` = our stage1-3)."""
    if backbone in ('resnet50', 'resnet101'):
        return ([('bottleneck_layer_out', 'layer1_out'),
                 ('layer2_out', 'layer2_out'), ('layer3_out', 'layer3_out'),
                 ('layer4_out', 'layer4_out')],
                ['layer2', 'layer3', 'layer4'])
    if backbone == 'regnety6.4gf':
        return ([('bottleneck_layer_out', 's1_out'),
                 ('s2_out', 's2_out'), ('s3_out', 's3_out'),
                 ('s4_out', 's4_out')],
                ['s2', 's3', 's4'])
    return ([('bottleneck_layer_out', 'stage0_out'),
             ('stage1_out', 'stage1_out'), ('stage2_out', 'stage2_out'),
             ('stage3_out', 'stage3_out')],
            ['stage1', 'stage2', 'stage3'])


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------
def gen_entropic_student_ilsvrc():
    for backbone, spec in ES_ILSVRC.items():
        pairs, frozen = hint_pairs(backbone)
        for kind in ('fp', 'mshp'):
            entropy_paths = (['bottleneck_layer.eb_out'] if kind == 'fp'
                             else ['bottleneck_layer.eb_out',
                                   'bottleneck_layer.gc_out'])
            for beta in spec[kind]:
                name = (f"{spec['file_stem']}-{kind}-beta{beta}_"
                        f"from_{spec['from_stem']}.yaml")
                config = {
                    'dependencies': ['sc2bench_tpu.models',
                                     'sc2bench_tpu.transforms'],
                    'models': {
                        'teacher_model': {
                            'key': spec['teacher_key'],
                            'kwargs': {'num_classes': 1000},
                            'ckpt': f"./resource/ckpt/ilsvrc2012/teacher/"
                                    f"{spec['teacher_key']}.ckpt"},
                        'student_model': {
                            **student_block(backbone, kind),
                            'ckpt': f"./resource/ckpt/ilsvrc2012/"
                                    f"entropic_student/"
                                    f"{spec['file_stem']}-{kind}"
                                    f"-beta{beta}.ckpt"}},
                    'train': {**ilsvrc_loaders(),
                              'stage1': es_stage1(beta, pairs, entropy_paths,
                                                  frozen=frozen),
                              'stage2': es_stage2(kind=kind)},
                    'test': ilsvrc_test(),
                }
                dump(CFG / 'ilsvrc2012/supervised_compression/'
                     'entropic_student' / name, config)


def gen_entropic_student_coco():
    for beta in ES_FP_BETAS:
        config = {
            'dependencies': ['sc2bench_tpu.models'],
            'canvas_size': 1344, 'max_boxes': 100,
            'models': {
                'teacher_model': {'key': 'faster_rcnn_model',
                                  'kwargs': {'num_classes': 91}},
                'student_model': {
                    'key': 'faster_rcnn_model',
                    'kwargs': {
                        'num_classes': 91,
                        'backbone_config': {
                            'resnet_name': 'resnet50',
                            'bottleneck_config': {
                                'key': 'FPBasedResNetBottleneck',
                                'kwargs': {'num_bottleneck_channels': 24,
                                           'num_target_channels': 256}}}},
                    'ckpt': f'./resource/ckpt/coco2017/entropic_student/'
                            f'faster_rcnn_fp-beta{beta}.ckpt'}},
            'train': {
                'train_data_loader': coco_loader('train', 4, shuffle=True),
                'val_data_loader': coco_loader('val', 1),
                # Reference coco es yaml: epoch_to_update 0 (the bottleneck
                # arrives ImageNet-trained, tables built before stage1);
                # stage1 = 5-epoch HeadRCNN hint distillation (bottleneck
                # vs teacher layer1 + layers 2-4 pairwise, NO rate term —
                # beta only names the inherited ckpt lineage), encoder +
                # entropy bottleneck frozen so the decoder+tail adapt;
                # stage2 = 5-epoch full detection fine-tune, same frozen set.
                'stage1': {
                    'num_epochs': 5, 'epoch_to_update': 0, 'train_bn': False,
                    'detection_loss_weight': 0.0,
                    'frozen_modules': es_frozen_stage2('fp'),
                    'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
                    'scheduler': {'key': 'MultiStepLR',
                                  'kwargs': {'milestones': [3],
                                             'gamma': 0.1}},
                    'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                        'sub_terms': dict(
                            {'hint1': {'criterion': {
                                'key': 'MSELoss', 'kwargs': {
                                    'student_module_path':
                                        'backbone.bottleneck_layer_out',
                                    'teacher_module_path':
                                        'backbone.layer1_out',
                                    'reduction': 'sum'}}, 'weight': 1.0}},
                            **{f'hint{i}': {'criterion': {
                                'key': 'MSELoss', 'kwargs': {
                                    'student_module_path':
                                        f'backbone.layer{i}_out',
                                    'teacher_module_path':
                                        f'backbone.layer{i}_out',
                                    'reduction': 'sum'}}, 'weight': 1.0}
                               for i in (2, 3, 4)})}},
                },
                'stage2': {
                    'num_epochs': 5, 'train_bn': True,
                    'detection_loss_weight': 1.0,
                    'frozen_modules': es_frozen_stage2('fp'),
                    'optimizer': {'key': 'SGD', 'kwargs': {
                        'lr': 0.0001, 'momentum': 0.9,
                        'weight_decay': 0.0005}},
                    'scheduler': {'key': 'MultiStepLR',
                                  'kwargs': {'milestones': [3],
                                             'gamma': 0.1}},
                    'criterion': {'key': 'WeightedSumLoss',
                                  'kwargs': {'sub_terms': {}}}},
            },
            'test': {'test_data_loader': coco_loader('val', 1)},
        }
        dump(CFG / 'coco2017/supervised_compression/entropic_student' /
             f'faster_rcnn_splittable_resnet50-fp-beta{beta}_fpn_'
             f'from_faster_rcnn_resnet50_fpn.yaml', config)


def gen_entropic_student_voc():
    for beta in ES_FP_BETAS[1:]:  # seg grid starts at 0.16
        config = {
            'dependencies': ['sc2bench_tpu.models'],
            'image_size': [512, 512], 'num_classes': 21,
            'models': {
                'teacher_model': {'key': 'deeplabv3_model', 'kwargs': {
                    'backbone_name': 'resnet50', 'num_classes': 21,
                    'uses_aux': True}},
                'student_model': {
                    'key': 'deeplabv3_model',
                    'kwargs': {
                        'backbone_name': 'resnet50', 'num_classes': 21,
                        'uses_aux': True,
                        'bottleneck_config': {
                            'key': 'FPBasedResNetBottleneck',
                            'kwargs': {'num_bottleneck_channels': 24,
                                       'num_target_channels': 256}}},
                    'ckpt': f'./resource/ckpt/pascal_voc2012/'
                            f'entropic_student/deeplabv3_fp-beta{beta}.ckpt'}},
            # Reference voc es yaml: epoch_to_update 0 (ImageNet-trained
            # bottleneck reused); stage1 = 40-epoch backbone hint
            # distillation on layer2-4 with encoder+entropy bottleneck AND
            # layer3/layer4 frozen (only the bottleneck decoder + layer2
            # adapt); stage2 = 10-epoch seg CE (+0.5 aux) fine-tune with
            # poly LR and a 10x head LR, encoder+entropy bottleneck frozen.
            'train': {
                'train_data_loader': voc_loader('train', 16, shuffle=True),
                'val_data_loader': voc_loader('val', 1),
                'stage1': {
                    'num_epochs': 40, 'epoch_to_update': 0,
                    'train_bn': False,
                    'frozen_modules': es_frozen_stage2('fp')
                    + ['layer3', 'layer4'],
                    'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
                    'scheduler': {'key': 'MultiStepLR',
                                  'kwargs': {'milestones': [30, 35],
                                             'gamma': 0.1}},
                    'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                        'sub_terms': {f'hint{i}': {'criterion': {
                            'key': 'MSELoss', 'kwargs': {
                                'student_module_path':
                                    f'backbone.layer{i}_out',
                                'teacher_module_path':
                                    f'backbone.layer{i}_out',
                                'reduction': 'sum'}}, 'weight': 1.0}
                            for i in (2, 3, 4)}}}},
                'stage2': {
                    'num_epochs': 10, 'train_bn': True,
                    'frozen_modules': es_frozen_stage2('fp'),
                    'optimizer': {
                        'key': 'SGD',
                        'kwargs': {'lr': 0.0025, 'momentum': 0.9,
                                   'weight_decay': 1e-4},
                        'module_wise_kwargs': [
                            {'module': 'aux_classifier',
                             'kwargs': {'lr': 0.025}}]},
                    'scheduler': {'key': 'poly', 'kwargs': {'power': 0.9}},
                    'criterion': {'key': 'SegCrossEntropyLoss', 'kwargs': {
                        'module_path': 'output',
                        'aux_module_path': 'output.aux',
                        'aux_weight': 0.5}}},
            },
            'test': {'test_data_loader': voc_loader('val', 1)},
        }
        dump(CFG / 'pascal_voc2012/supervised_compression/entropic_student' /
             f'deeplabv3_splittable_resnet50-fp-beta{beta}_'
             f'from_deeplabv3_resnet50.yaml', config)


def gen_end_to_end():
    # ilsvrc2012 (reference names use 'splitable_')
    for beta in E2E_BETAS:
        config = {
            'dependencies': ['sc2bench_tpu.models'],
            'models': {'model': {
                'key': 'splittable_resnet',
                'kwargs': {'num_classes': 1000, 'resnet_name': 'resnet50',
                           'bottleneck_config': {
                               'key': 'FPBasedResNetBottleneck',
                               'kwargs': {'num_bottleneck_channels': 24,
                                          'num_target_channels': 256}}},
                'ckpt': f'./resource/ckpt/ilsvrc2012/end_to_end/'
                        f'splitable_resnet50-fp-beta{beta}.ckpt'}},
            'train': {**ilsvrc_loaders(),
                      'num_epochs': 60, 'epoch_to_update': 60,
                      'train_bn': True,
                      'optimizer': {'key': 'SGD', 'kwargs': {
                          'lr': 0.1, 'momentum': 0.9, 'weight_decay': 1e-4}},
                      'scheduler': {'key': 'CosineAnnealingLR',
                                    'kwargs': {'T_max': 60}},
                      'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                          'sub_terms': {
                              'ce': {'criterion': {
                                  'key': 'CrossEntropyLoss',
                                  'kwargs': {'module_path': 'output'}},
                                  'weight': 1.0},
                              'bpp': {'criterion': {
                                  'key': 'BppLoss', 'kwargs': {
                                      'entropy_module_path':
                                          'bottleneck_layer.eb_out',
                                      'reduction': 'sum'}},
                                  'weight': float(beta)}}}}},
            'test': ilsvrc_test(),
        }
        dump(CFG / 'ilsvrc2012/supervised_compression/end-to-end' /
             f'splitable_resnet50-fp-beta{beta}.yaml', config)
    # coco2017: detector trained end-to-end with rate term
    for beta in E2E_BETAS:
        config = {
            'dependencies': ['sc2bench_tpu.models'],
            'canvas_size': 1344, 'max_boxes': 100,
            'models': {'model': {
                'key': 'faster_rcnn_model',
                'kwargs': {
                    'num_classes': 91,
                    'backbone_config': {
                        'resnet_name': 'resnet50',
                        'bottleneck_config': {
                            'key': 'FPBasedResNetBottleneck',
                            'kwargs': {'num_bottleneck_channels': 24,
                                       'num_target_channels': 256}}}},
                'ckpt': f'./resource/ckpt/coco2017/end_to_end/'
                        f'faster_rcnn_fp-beta{beta}.ckpt'}},
            'train': {
                'train_data_loader': coco_loader('train', 4, shuffle=True),
                'val_data_loader': coco_loader('val', 1),
                'num_epochs': 5, 'train_bn': True,
                'detection_loss_weight': 1.0,
                'optimizer': {'key': 'SGD', 'kwargs': {
                    'lr': 0.01, 'momentum': 0.9, 'weight_decay': 1e-4}},
                'scheduler': {'key': 'poly', 'kwargs': {'power': 0.9}},
                'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                    'sub_terms': {
                        'bpp': {'criterion': {'key': 'BppLoss', 'kwargs': {
                            'entropy_module_path':
                                'backbone.bottleneck_layer.eb_out',
                            'reduction': 'sum'}},
                            'weight': float(beta)}}}},
            },
            'test': {'test_data_loader': coco_loader('val', 1)},
        }
        dump(CFG / 'coco2017/supervised_compression/end-to-end' /
             f'faster_rcnn_splittable_resnet50-fp-beta{beta}_fpn.yaml',
             config)
    # pascal_voc2012: deeplabv3 trained end-to-end with rate term
    for beta in E2E_BETAS:
        config = {
            'dependencies': ['sc2bench_tpu.models'],
            'image_size': [512, 512], 'num_classes': 21,
            'models': {'model': {
                'key': 'deeplabv3_model',
                'kwargs': {
                    'backbone_name': 'resnet50', 'num_classes': 21,
                    'uses_aux': False,
                    'bottleneck_config': {
                        'key': 'FPBasedResNetBottleneck',
                        'kwargs': {'num_bottleneck_channels': 24,
                                   'num_target_channels': 256}}},
                'ckpt': f'./resource/ckpt/pascal_voc2012/end_to_end/'
                        f'deeplabv3_fp-beta{beta}.ckpt'}},
            'train': {
                'train_data_loader': voc_loader('train', 8, shuffle=True),
                'val_data_loader': voc_loader('val', 1),
                'num_epochs': 30, 'train_bn': True,
                'optimizer': {'key': 'SGD', 'kwargs': {
                    'lr': 0.02, 'momentum': 0.9, 'weight_decay': 1e-4}},
                'scheduler': {'key': 'poly', 'kwargs': {'power': 0.9}},
                'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                    'sub_terms': {
                        'ce': {'criterion': {
                            'key': 'SegCrossEntropyLoss',
                            'kwargs': {'module_path': 'output'}},
                            'weight': 1.0},
                        'bpp': {'criterion': {'key': 'BppLoss', 'kwargs': {
                            'entropy_module_path':
                                'backbone.bottleneck_layer.eb_out',
                            'reduction': 'sum'}},
                            'weight': float(beta)}}}},
            },
            'test': {'test_data_loader': voc_loader('val', 1)},
        }
        dump(CFG / 'pascal_voc2012/supervised_compression/end-to-end' /
             f'deeplabv3_splittable_resnet50-fp-beta{beta}.yaml', config)


def ghnd_stage(frozen, hint_prefix='', epochs=20, milestones=(5, 10, 15),
               bottleneck_hint=True):
    """GHND head-distillation stage (hint MSE only, no rate term).

    Reference grids: ilsvrc 20 epochs MultiStep[5,10,15] frozen layer2-4
    with a bottleneck-vs-layer1 hint; coco 20 epochs MultiStep[5,15]
    frozen [] with the same 4 hints; voc 50 epochs MultiStep[30,40]
    frozen layer3/4 with layer2-4 hints only (no bottleneck pair)."""
    sub_terms = {}
    if bottleneck_hint:
        sub_terms['hint1'] = {
            'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': f'{hint_prefix}bottleneck_layer_out',
                'teacher_module_path': f'{hint_prefix}layer1_out',
                'reduction': 'sum'}}, 'weight': 1.0}
    for i, layer in enumerate(['layer2', 'layer3', 'layer4'], start=2):
        sub_terms[f'hint{i}'] = {
            'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': f'{hint_prefix}{layer}_out',
                'teacher_module_path': f'{hint_prefix}{layer}_out',
                'reduction': 'sum'}}, 'weight': 1.0}
    return {
        'num_epochs': epochs, 'train_bn': False,
        'frozen_modules': list(frozen),
        'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
        'scheduler': {'key': 'MultiStepLR',
                      'kwargs': {'milestones': list(milestones),
                                 'gamma': 0.1}},
        'criterion': {'key': 'WeightedSumLoss',
                      'kwargs': {'sub_terms': sub_terms}},
    }


def gen_ghnd_bq():
    for bch in GHND_CHANNELS:
        # ilsvrc2012
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'models': {
                'teacher_model': {'key': 'resnet50',
                                  'kwargs': {'num_classes': 1000}},
                'student_model': {
                    'key': 'splittable_resnet',
                    'kwargs': {
                        'num_classes': 1000, 'resnet_name': 'resnet50',
                        'bottleneck_config': {
                            'key': 'larger_resnet_bottleneck',
                            'kwargs': {'bottleneck_channel': bch,
                                       'output_channel': 256}}},
                    'ckpt': f'./resource/ckpt/ilsvrc2012/ghnd-bq/'
                            f'resnet50-bq{bch}ch.ckpt'}},
            'wrapper': {
                'key': 'SplitClassifier',
                'kwargs': {
                    'compressor': {'key': 'SimpleQuantizer',
                                   'kwargs': {'num_bits': 8}},
                    'decompressor': {'key': 'SimpleDequantizer',
                                     'kwargs': {'num_bits': 8}}}},
            'train': {**ilsvrc_loaders(),
                      'stage1': ghnd_stage(['layer2', 'layer3', 'layer4'])},
            'test': ilsvrc_test(),
        }
        dump(CFG / 'ilsvrc2012/supervised_compression/ghnd-bq' /
             f'resnet50-bq{bch}ch_from_resnet50.yaml', config)
        # coco2017
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'canvas_size': 1344, 'max_boxes': 100,
            'models': {
                'teacher_model': {'key': 'faster_rcnn_model',
                                  'kwargs': {'num_classes': 91}},
                'student_model': {
                    'key': 'faster_rcnn_model',
                    'kwargs': {
                        'num_classes': 91,
                        'backbone_config': {
                            'resnet_name': 'resnet50',
                            'bottleneck_config': {
                                'key': 'larger_resnet_bottleneck',
                                'kwargs': {'bottleneck_channel': bch,
                                           'output_channel': 256}}}},
                    'ckpt': f'./resource/ckpt/coco2017/ghnd-bq/'
                            f'faster_rcnn_bq{bch}ch.ckpt'}},
            'train': {
                'train_data_loader': coco_loader('train', 4, shuffle=True),
                'val_data_loader': coco_loader('val', 1),
                'stage1': {**ghnd_stage(
                    [], hint_prefix='backbone.', milestones=(5, 15)),
                    'detection_loss_weight': 0.0},
            },
            'test': {'test_data_loader': coco_loader('val', 1)},
        }
        dump(CFG / 'coco2017/supervised_compression/ghnd-bq' /
             f'faster_rcnn_resnet50-bq{bch}ch_fpn_'
             f'from_faster_rcnn_resnet50_fpn.yaml', config)
        # pascal_voc2012
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'image_size': [512, 512], 'num_classes': 21,
            'models': {
                'teacher_model': {'key': 'deeplabv3_model', 'kwargs': {
                    'backbone_name': 'resnet50', 'num_classes': 21,
                    'uses_aux': False}},
                'student_model': {
                    'key': 'deeplabv3_model',
                    'kwargs': {
                        'backbone_name': 'resnet50', 'num_classes': 21,
                        'uses_aux': False,
                        'bottleneck_config': {
                            'key': 'larger_resnet_bottleneck',
                            'kwargs': {'bottleneck_channel': bch,
                                       'output_channel': 256}}},
                    'ckpt': f'./resource/ckpt/pascal_voc2012/ghnd-bq/'
                            f'deeplabv3_bq{bch}ch.ckpt'}},
            'train': {
                'train_data_loader': voc_loader('train', 8, shuffle=True),
                'val_data_loader': voc_loader('val', 1),
                'stage1': ghnd_stage(['layer3', 'layer4'],
                                     hint_prefix='backbone.', epochs=50,
                                     milestones=(30, 40),
                                     bottleneck_hint=False),
            },
            'test': {'test_data_loader': voc_loader('val', 1)},
        }
        dump(CFG / 'pascal_voc2012/supervised_compression/ghnd-bq' /
             f'deeplabv3_resnet50-bq{bch}ch_from_deeplabv3_resnet50.yaml',
             config)


def gen_fine_tuning():
    for split, betas in FT_GRID.items():
        for beta in betas:
            config = {
                'dependencies': ['sc2bench_tpu.models'],
                'models': {'model': {
                    'key': 'entropic_classifier',
                    'kwargs': {'base_name': 'resnet50',
                               'split_layer': split,
                               'num_classes': 1000},
                    'ckpt': f'./resource/ckpt/ilsvrc2012/fine-tuning/'
                            f'resnet50-eb_after_{split}-beta{beta}.ckpt'}},
                # reference fine-tuning yaml `:96-160`: 10 epochs Adam 1e-3
                # MultiStep[5,8], grad accum 2, CE(mean) + beta*bpp(batchmean)
                'train': {**ilsvrc_loaders(),
                          'num_epochs': 10, 'epoch_to_update': 10,
                          'train_bn': False, 'grad_accum_step': 2,
                          'optimizer': {'key': 'Adam',
                                        'kwargs': {'lr': 1e-3}},
                          'scheduler': {'key': 'MultiStepLR',
                                        'kwargs': {'milestones': [5, 8],
                                                   'gamma': 0.1}},
                          'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                              'sub_terms': {
                                  'ce': {'criterion': {
                                      'key': 'CrossEntropyLoss',
                                      'kwargs': {'module_path': 'output'}},
                                      'weight': 1.0},
                                  'bpp': {'criterion': {
                                      'key': 'BppLoss', 'kwargs': {
                                          'entropy_module_path': 'eb_out',
                                          'reduction': 'batchmean'}},
                                      'weight': float(beta)}}}}},
                'test': ilsvrc_test(),
            }
            dump(CFG / 'ilsvrc2012/supervised_compression/fine-tuning' /
                 f'resnet50-eb_after_{split}-beta{beta}.yaml', config)


# ---------------------------------------------------------------------------
# input compression (test-only wrapper configs + sweep metadata)
# ---------------------------------------------------------------------------
def codec_block(codec):
    fmt = {'jpeg': 'JPEG', 'webp': 'WEBP'}.get(codec)
    if fmt:
        return ({'key': 'PILImageModule',
                 'kwargs': {'format': fmt, 'quality': 75,
                            'returns_file_size': True}}, JPEG_QUALITIES)
    key = {'bpg': 'BPGModule', 'vtm': 'VTMModule'}[codec]
    qualities = BPG_QUALITIES if codec == 'bpg' else list(range(12, 52, 5))
    return ({'key': key, 'kwargs': {'quality': 30,
                                    'returns_file_size': True}}, qualities)


def gen_input_compression_ilsvrc():
    post = [{'key': 'CustomToTensor', 'kwargs': {}},
            {'key': 'Normalize', 'kwargs': {}}]
    analysis = {'analyzer_configs': [{'key': 'FileSizeAccumulator',
                                      'kwargs': {'unit': 'KB'}}]}
    codec_targets = [('jpeg', b) for b in
                     ('resnet50', 'resnet101', 'resnet152',
                      'tf_efficientnet_l2_ns', 'tf_efficientnet_l2_ns_475')]
    codec_targets += [(c, b) for c in ('webp', 'bpg') for b in
                      ('resnet50', 'resnet101', 'resnet152')]
    codec_targets += [('vtm', 'resnet50')]
    for codec, backbone in codec_targets:
        codec_cfg, qualities = codec_block(codec)
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'models': {'wrapper': {
                'key': 'CodecInputCompressionClassifier',
                'classification_model': {'key': backbone,
                                         'kwargs': {'num_classes': 1000}},
                'kwargs': {'codec_encoder_decoder': codec_cfg,
                           'post_transform': post,
                           'analysis_config': analysis}}},
            'test': ilsvrc_test(),
            'sweep': {'qualities': qualities,
                      'json_template':
                          '{"models": {"wrapper": {"kwargs": '
                          '{"codec_encoder_decoder": {"kwargs": '
                          '{"quality": %d}}}}}}'},
        }
        dump(CFG / 'ilsvrc2012/input_compression' /
             f'{codec}-{backbone}.yaml', config)
    neural_targets = [(f, 'resnet50') for f in NEURAL_FAMILIES]
    neural_targets += [(f, b) for f in
                       ('factorized_prior', 'scale_hyperprior',
                        'mean_scale_hyperprior')
                       for b in ('tf_efficientnet_l2_ns',
                                 'tf_efficientnet_l2_ns_475')]
    for family, backbone in neural_targets:
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'models': {'wrapper': {
                'key': 'NeuralInputCompressionClassifier',
                'classification_model': {'key': backbone,
                                         'kwargs': {'num_classes': 1000}},
                'compression_model': {
                    'key': family, 'kwargs': {'quality': 1},
                    'ckpt': f'./resource/ckpt/codec/{family}-q1.ckpt'},
                'kwargs': {
                    'pre_transform': [{'key': 'AdaptivePad',
                                       'kwargs': {'factor': 64}}],
                    'analysis_config': {
                        'analyzes_after_compress': True,
                        'analyzer_configs': [
                            {'key': 'FileSizeAnalyzer',
                             'kwargs': {'unit': 'KB'}}]}}}},
            'test': ilsvrc_test(),
            'sweep': {'qualities': NEURAL_QUALITIES,
                      'json_template':
                          '{"models": {"wrapper": {"compression_model": '
                          '{"kwargs": {"quality": %d}, "ckpt": '
                          '"./resource/ckpt/codec/' + family +
                          '-q%d.ckpt"}}}}'},
        }
        dump(CFG / 'ilsvrc2012/input_compression' /
             f'{family}-{backbone}.yaml', config)


def gen_input_compression_coco():
    for codec in ('jpeg', 'webp', 'bpg'):
        codec_cfg, qualities = codec_block(codec)
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'canvas_size': 1344,
            'models': {'wrapper': {
                'key': 'InputCompressionDetectionModel',
                'detection_model': {'key': 'faster_rcnn_model',
                                    'kwargs': {'num_classes': 91}},
                'kwargs': {'codec_config': {
                    'key': codec_cfg['key'],
                    'kwargs': {k: v for k, v in codec_cfg['kwargs'].items()
                               if k != 'returns_file_size'}}}}},
            'test': {'test_data_loader': coco_loader('val', 1)},
            'sweep': {'qualities': qualities,
                      'json_template':
                          '{"models": {"wrapper": {"kwargs": '
                          '{"codec_config": {"kwargs": '
                          '{"quality": %d}}}}}}'},
        }
        dump(CFG / 'coco2017/input_compression' /
             f'{codec}-faster_rcnn_resnet50_fpn.yaml', config)
    for family in NEURAL_FAMILIES:
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'canvas_size': 1344,
            'models': {'wrapper': {
                'key': 'InputCompressionDetectionModel',
                'detection_model': {'key': 'faster_rcnn_model',
                                    'kwargs': {'num_classes': 91}},
                'compression_model': {
                    'key': family, 'kwargs': {'quality': 1},
                    'ckpt': f'./resource/ckpt/codec/{family}-q1.ckpt'},
                'kwargs': {}}},
            'test': {'test_data_loader': coco_loader('val', 1)},
            'sweep': {'qualities': NEURAL_QUALITIES,
                      'json_template':
                          '{"models": {"wrapper": {"compression_model": '
                          '{"kwargs": {"quality": %d}, "ckpt": '
                          '"./resource/ckpt/codec/' + family +
                          '-q%d.ckpt"}}}}'},
        }
        dump(CFG / 'coco2017/input_compression' /
             f'{family}-faster_rcnn_resnet50_fpn.yaml', config)


def gen_input_compression_voc():
    post = [{'key': 'CustomToTensor', 'kwargs': {}},
            {'key': 'Normalize', 'kwargs': {}}]
    for codec in ('jpeg', 'webp', 'bpg'):
        codec_cfg, qualities = codec_block(codec)
        for backbone in ('resnet50', 'resnet101'):
            config = {
                'dependencies': ['sc2bench_tpu.models',
                                 'sc2bench_tpu.transforms'],
                'image_size': [512, 512], 'num_classes': 21,
                'models': {'wrapper': {
                    'key': 'CodecInputCompressionSegmentationModel',
                    'segmentation_model': {'key': 'deeplabv3_model',
                                           'kwargs': {
                                               'backbone_name': backbone,
                                               'num_classes': 21}},
                    'kwargs': {'codec_encoder_decoder': codec_cfg,
                               'post_transform': post,
                               'analysis_config': {'analyzer_configs': [
                                   {'key': 'FileSizeAccumulator',
                                    'kwargs': {'unit': 'KB'}}]}}}},
                'test': {'test_data_loader': voc_loader('val', 1)},
                'sweep': {'qualities': qualities,
                          'json_template':
                              '{"models": {"wrapper": {"kwargs": '
                              '{"codec_encoder_decoder": {"kwargs": '
                              '{"quality": %d}}}}}}'},
            }
            dump(CFG / 'pascal_voc2012/input_compression' /
                 f'{codec}-deeplabv3_{backbone}.yaml', config)
    for family in NEURAL_FAMILIES:
        for backbone in ('resnet50', 'resnet101'):
            config = {
                'dependencies': ['sc2bench_tpu.models',
                                 'sc2bench_tpu.transforms'],
                'image_size': [512, 512], 'num_classes': 21,
                'models': {'wrapper': {
                    'key': 'NeuralInputCompressionSegmentationModel',
                    'segmentation_model': {'key': 'deeplabv3_model',
                                           'kwargs': {
                                               'backbone_name': backbone,
                                               'num_classes': 21}},
                    'compression_model': {
                        'key': family, 'kwargs': {'quality': 1},
                        'ckpt': f'./resource/ckpt/codec/{family}-q1.ckpt'},
                    'kwargs': {
                        'adaptive_pad_kwargs': {'factor': 64},
                        'analysis_config': {
                            'analyzes_after_compress': True,
                            'analyzer_configs': [
                                {'key': 'FileSizeAnalyzer',
                                 'kwargs': {'unit': 'KB'}}]}}}},
                'test': {'test_data_loader': voc_loader('val', 1)},
                'sweep': {'qualities': NEURAL_QUALITIES,
                          'json_template':
                              '{"models": {"wrapper": '
                              '{"compression_model": {"kwargs": '
                              '{"quality": %d}, "ckpt": '
                              '"./resource/ckpt/codec/' + family +
                              '-q%d.ckpt"}}}}'},
            }
            dump(CFG / 'pascal_voc2012/input_compression' /
                 f'{family}-deeplabv3_{backbone}.yaml', config)


def gen_feature_compression():
    for codec, fmt in [('jpeg', 'JPEG'), ('webp', 'WEBP')]:
        config = {
            'dependencies': ['sc2bench_tpu.models', 'sc2bench_tpu.transforms'],
            'models': {'wrapper': {
                'key': 'CodecFeatureCompressionClassifier',
                'classification_model': {'key': 'resnet50',
                                         'kwargs': {'num_classes': 1000}},
                'kwargs': {
                    'split_layer': 'layer2',
                    'compression_transform': {
                        'key': 'PILTensorModule',
                        'kwargs': {'format': fmt, 'quality': 90,
                                   'returns_file_size': True}},
                    'analysis_config': {'analyzer_configs': [
                        {'key': 'FileSizeAccumulator',
                         'kwargs': {'unit': 'KB'}}]}}}},
            'test': ilsvrc_test(),
        }
        dump(CFG / 'ilsvrc2012/feature_compression' /
             f'{codec}-resnet50.yaml', config)


GENERATED_DIRS = [
    'ilsvrc2012/supervised_compression/entropic_student',
    'ilsvrc2012/supervised_compression/end-to-end',
    'ilsvrc2012/supervised_compression/ghnd-bq',
    'ilsvrc2012/supervised_compression/fine-tuning',
    'ilsvrc2012/input_compression',
    'ilsvrc2012/feature_compression',
    'coco2017', 'pascal_voc2012',
]


if __name__ == '__main__':
    for d in GENERATED_DIRS:
        shutil.rmtree(CFG / d, ignore_errors=True)
    gen_entropic_student_ilsvrc()
    gen_entropic_student_coco()
    gen_entropic_student_voc()
    gen_end_to_end()
    gen_ghnd_bq()
    gen_fine_tuning()
    gen_input_compression_ilsvrc()
    gen_input_compression_coco()
    gen_input_compression_voc()
    gen_feature_compression()
    n = len(list(CFG.rglob('*.yaml')))
    print(f'{n} configs under {CFG}')
