#!/usr/bin/env python
"""Generate the experiment-config corpus.

Reproduces the reference's operating-point grids (BASELINE.md §sweeps,
`/root/reference/configs/` ~185 yamls): Entropic Student β sweeps (FP/MSHP ×
ResNet-50/101 + detection + segmentation), End-to-End β sweeps, CR+BQ channel
sweeps, fine-tuning split×β grids, codec/neural input-compression quality
sweeps, and feature compression. Run from the repo root:

    python script/gen_configs.py
"""
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]
CFG = REPO / 'configs'

ES_BETAS = [0.08, 0.16, 0.32, 0.64, 1.28, 2.56, 5.12]
ES_SEG_BETAS = [0.16, 0.32, 0.64, 1.28, 2.56, 5.12]
E2E_BETAS = [1.28e-8, 1.024e-7, 2.048e-7, 8.192e-7, 3.2768e-6]
GHND_CHANNELS = [1, 2, 3, 6, 9, 12]
FT_SPLITS = ['stem', 'layer1', 'layer2', 'layer3', 'layer4', 'avgpool']
FT_BETAS = [1.28e-8, 1.024e-7, 8.192e-7]
JPEG_QUALITIES = list(range(10, 101, 10))
BPG_QUALITIES = list(range(5, 51, 5))
NEURAL_QUALITIES = list(range(1, 9))
NEURAL_FAMILIES = ['factorized_prior', 'scale_hyperprior',
                   'mean_scale_hyperprior',
                   'joint_autoregressive_hierarchical_prior']


def dump(path, config):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, 'w') as f:
        yaml.safe_dump(config, f, sort_keys=False)


def ilsvrc_loaders(train_bs=256, test_bs=1):
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


def es_stage1(beta, epochs=10, frozen=('layer2', 'layer3', 'layer4', 'fc')):
    sub_terms = {}
    for i, (sp, tp) in enumerate([
            ('bottleneck_layer_out', 'layer1_out'),
            ('layer2_out', 'layer2_out'), ('layer3_out', 'layer3_out'),
            ('layer4_out', 'layer4_out')], start=1):
        sub_terms[f'layer{i}'] = {
            'criterion': {'key': 'MSELoss', 'kwargs': {
                'student_module_path': sp, 'teacher_module_path': tp,
                'reduction': 'sum'}}, 'weight': 1.0}
    sub_terms['bpp'] = {'criterion': {'key': 'BppLoss', 'kwargs': {
        'entropy_module_path': 'bottleneck_layer.eb_out',
        'reduction': 'batchmean'}}, 'weight': beta}
    return {
        'num_epochs': epochs, 'epoch_to_update': epochs, 'train_bn': False,
        'frozen_modules': list(frozen),
        'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
        'scheduler': {'key': 'MultiStepLR',
                      'kwargs': {'milestones': [5, 8], 'gamma': 0.1}},
        'criterion': {'key': 'WeightedSumLoss',
                      'kwargs': {'sub_terms': sub_terms}},
    }


def es_stage2(epochs=10):
    return {
        'num_epochs': epochs, 'train_bn': True,
        'frozen_modules': ['bottleneck_layer'],
        'optimizer': {'key': 'SGD', 'kwargs': {'lr': 0.001, 'momentum': 0.9,
                                               'weight_decay': 0.0001}},
        'scheduler': {'key': 'MultiStepLR',
                      'kwargs': {'milestones': [5], 'gamma': 0.1}},
        'criterion': {'key': 'KDLoss', 'kwargs': {
            'student_module_path': 'output',
            'teacher_module_path': 'output',
            'temperature': 1.0, 'alpha': 0.5}},
    }


def gen_entropic_student():
    for backbone in ['resnet50', 'resnet101']:
        for bkey, tag in [('FPBasedResNetBottleneck', 'fp'),
                          ('MSHPBasedResNetBottleneck', 'mshp')]:
            for beta in ES_BETAS:
                name = (f'splittable_{backbone}-{tag}-beta{beta}_'
                        f'from_{backbone}.yaml')
                config = {
                    'dependencies': ['sc2bench_tpu.models',
                                     'sc2bench_tpu.transforms'],
                    'models': {
                        'teacher_model': {
                            'key': backbone, 'kwargs': {'num_classes': 1000},
                            'ckpt': f'./resource/ckpt/ilsvrc2012/teacher/'
                                    f'{backbone}.ckpt'},
                        'student_model': {
                            'key': 'splittable_resnet',
                            'kwargs': {
                                'num_classes': 1000,
                                'resnet_name': backbone,
                                'bottleneck_config': {
                                    'key': bkey,
                                    'kwargs': {
                                        'num_bottleneck_channels': 24,
                                        'num_target_channels': 256}}},
                            'ckpt': f'./resource/ckpt/ilsvrc2012/'
                                    f'entropic_student/splittable_'
                                    f'{backbone}-{tag}-beta{beta}.ckpt'}},
                    'train': {**ilsvrc_loaders(),
                              'stage1': es_stage1(beta),
                              'stage2': es_stage2()},
                    'test': ilsvrc_test(),
                }
                dump(CFG / 'ilsvrc2012/supervised_compression/'
                     'entropic_student' / name, config)
    # detection + segmentation variants reuse the ImageNet bottleneck
    for beta in ES_BETAS:
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
                'train_data_loader': {
                    'dataset': {'key': 'CocoDetectionDataset', 'kwargs': {
                        'img_dir': '~/datasets/coco2017/train2017',
                        'ann_file_path': '~/datasets/coco2017/annotations/'
                                         'instances_train2017.json'}},
                    'batch_size': 4, 'shuffle': True},
                'val_data_loader': {
                    'dataset': {'key': 'CocoDetectionDataset', 'kwargs': {
                        'img_dir': '~/datasets/coco2017/val2017',
                        'ann_file_path': '~/datasets/coco2017/annotations/'
                                         'instances_val2017.json'}},
                    'batch_size': 1},
                'stage1': {
                    'num_epochs': 3, 'epoch_to_update': 0, 'train_bn': False,
                    'detection_loss_weight': 0.0,
                    'frozen_modules': ['layer2', 'layer3', 'layer4',
                                       'rpn_head', 'box_head',
                                       'box_predictor'],
                    'optimizer': {'key': 'Adam', 'kwargs': {'lr': 0.001}},
                    'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                        'sub_terms': {
                            'c2': {'criterion': {'key': 'MSELoss', 'kwargs': {
                                'student_module_path':
                                    'backbone.bottleneck_layer_out',
                                'teacher_module_path':
                                    'backbone.layer1_out',
                                'reduction': 'sum'}}, 'weight': 1.0},
                            'bpp': {'criterion': {'key': 'BppLoss',
                                                  'kwargs': {
                                'entropy_module_path':
                                    'backbone.bottleneck_layer.eb_out',
                                'reduction': 'batchmean'}},
                                'weight': beta}}}}},
                'stage2': {
                    'num_epochs': 2, 'train_bn': True,
                    'detection_loss_weight': 1.0,
                    'frozen_modules': ['bottleneck_layer'],
                    'optimizer': {'key': 'SGD', 'kwargs': {
                        'lr': 0.0001, 'momentum': 0.9}},
                    'criterion': {'key': 'WeightedSumLoss',
                                  'kwargs': {'sub_terms': {}}}},
            },
            'test': {'test_data_loader': {
                'dataset': {'key': 'CocoDetectionDataset', 'kwargs': {
                    'img_dir': '~/datasets/coco2017/val2017',
                    'ann_file_path': '~/datasets/coco2017/annotations/'
                                     'instances_val2017.json'}},
                'batch_size': 1}},
        }
        dump(CFG / 'coco2017/supervised_compression/entropic_student' /
             f'faster_rcnn_splittable_resnet50-fp-beta{beta}_fpn.yaml',
             config)
    for beta in ES_SEG_BETAS:
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
                        'uses_aux': False,
                        'bottleneck_config': {
                            'key': 'FPBasedResNetBottleneck',
                            'kwargs': {'num_bottleneck_channels': 24,
                                       'num_target_channels': 256}}},
                    'ckpt': f'./resource/ckpt/pascal_voc2012/'
                            f'entropic_student/deeplabv3_fp-beta{beta}.ckpt'}},
            'train': {
                'train_data_loader': {
                    'dataset': {'key': 'VOCSegmentationDataset', 'kwargs': {
                        'root': '~/datasets/pascal_voc2012',
                        'image_set': 'train'}},
                    'batch_size': 8, 'shuffle': True},
                'val_data_loader': {
                    'dataset': {'key': 'VOCSegmentationDataset', 'kwargs': {
                        'root': '~/datasets/pascal_voc2012',
                        'image_set': 'val'}},
                    'batch_size': 1},
                'stage1': {
                    'num_epochs': 5, 'epoch_to_update': 0, 'train_bn': True,
                    'frozen_modules': ['bottleneck_layer'],
                    'optimizer': {'key': 'SGD', 'kwargs': {
                        'lr': 0.007, 'momentum': 0.9,
                        'weight_decay': 1e-4}},
                    'scheduler': {'key': 'poly', 'kwargs': {'power': 0.9}},
                    'criterion': {'key': 'SegCrossEntropyLoss', 'kwargs': {
                        'module_path': 'output',
                        'aux_module_path': 'output.aux',
                        'aux_weight': 0.5}}},
            },
            'test': {'test_data_loader': {
                'dataset': {'key': 'VOCSegmentationDataset', 'kwargs': {
                    'root': '~/datasets/pascal_voc2012',
                    'image_set': 'val'}},
                'batch_size': 1}},
        }
        dump(CFG / 'pascal_voc2012/supervised_compression/entropic_student' /
             f'deeplabv3_splittable_resnet50-fp-beta{beta}.yaml', config)


def gen_end_to_end():
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
                        f'splittable_resnet50-fp-beta{beta}.ckpt'}},
            'train': {**ilsvrc_loaders(),
                      'num_epochs': 60, 'epoch_to_update': 60,
                      'train_bn': True,
                      'optimizer': {'key': 'SGD', 'kwargs': {
                          'lr': 0.1, 'momentum': 0.9,
                          'weight_decay': 1e-4}},
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
                                  'weight': beta}}}}},
            'test': ilsvrc_test(),
        }
        dump(CFG / 'ilsvrc2012/supervised_compression/end-to-end' /
             f'splittable_resnet50-fp-beta{beta}.yaml', config)


def gen_ghnd_bq():
    for bch in GHND_CHANNELS:
        for quant_bits in [8]:
            config = {
                'dependencies': ['sc2bench_tpu.models',
                                 'sc2bench_tpu.transforms'],
                'models': {
                    'teacher_model': {'key': 'resnet50',
                                      'kwargs': {'num_classes': 1000}},
                    'student_model': {
                        'key': 'splittable_resnet',
                        'kwargs': {
                            'num_classes': 1000, 'resnet_name': 'resnet50',
                            'bottleneck_config': {
                                'key': 'larger_resnet_bottleneck',
                                'kwargs': {'bottleneck_channel': bch}}},
                        'ckpt': f'./resource/ckpt/ilsvrc2012/ghnd-bq/'
                                f'resnet50-bq{bch}ch.ckpt'}},
                'wrapper': {
                    'key': 'SplitClassifier',
                    'kwargs': {
                        'compressor': {'key': 'SimpleQuantizer',
                                       'kwargs': {'num_bits': quant_bits}},
                        'decompressor': {'key': 'SimpleDequantizer',
                                         'kwargs': {'num_bits': quant_bits}}}},
                'train': {**ilsvrc_loaders(),
                          'stage1': es_stage1(0.0, epochs=20)},
                'test': ilsvrc_test(),
            }
            # GHND has no rate term
            del config['train']['stage1']['criterion']['kwargs'][
                'sub_terms']['bpp']
            config['train']['stage1'].pop('epoch_to_update')
            dump(CFG / 'ilsvrc2012/supervised_compression/ghnd-bq' /
                 f'resnet50-bq{bch}ch_from_resnet50.yaml', config)


def gen_fine_tuning():
    for split in FT_SPLITS:
        for beta in FT_BETAS:
            config = {
                'dependencies': ['sc2bench_tpu.models'],
                'models': {'model': {
                    'key': 'entropic_classifier',
                    'kwargs': {'base_name': 'resnet50',
                               'split_layer': split,
                               'num_classes': 1000},
                    'ckpt': f'./resource/ckpt/ilsvrc2012/fine-tuning/'
                            f'resnet50-eb_after_{split}-beta{beta}.ckpt'}},
                'train': {**ilsvrc_loaders(),
                          'num_epochs': 10, 'epoch_to_update': 10,
                          'train_bn': False, 'grad_accum_step': 4,
                          'optimizer': {'key': 'Adam',
                                        'kwargs': {'lr': 1e-4}},
                          'criterion': {'key': 'WeightedSumLoss', 'kwargs': {
                              'sub_terms': {
                                  'ce': {'criterion': {
                                      'key': 'CrossEntropyLoss',
                                      'kwargs': {'module_path': 'output'}},
                                      'weight': 1.0},
                                  'bpp': {'criterion': {
                                      'key': 'BppLoss', 'kwargs': {
                                          'entropy_module_path': 'eb_out',
                                          'reduction': 'sum'}},
                                      'weight': beta}}}}},
                'test': ilsvrc_test(),
            }
            dump(CFG / 'ilsvrc2012/supervised_compression/fine-tuning' /
                 f'resnet50-eb_after_{split}-beta{beta}.yaml', config)


def gen_input_compression():
    # codec input compression: one config per codec; quality swept via --json
    for codec, fmt, qualities in [
            ('jpeg', 'JPEG', JPEG_QUALITIES), ('webp', 'WEBP',
                                               JPEG_QUALITIES)]:
        config = {
            'dependencies': ['sc2bench_tpu.models',
                             'sc2bench_tpu.transforms'],
            'models': {'wrapper': {
                'key': 'CodecInputCompressionClassifier',
                'classification_model': {'key': 'resnet50',
                                         'kwargs': {'num_classes': 1000}},
                'kwargs': {
                    'codec_encoder_decoder': {
                        'key': 'PILImageModule',
                        'kwargs': {'format': fmt, 'quality': 75,
                                   'returns_file_size': True}},
                    'post_transform': [
                        {'key': 'CustomToTensor', 'kwargs': {}},
                        {'key': 'Normalize', 'kwargs': {}}],
                    'analysis_config': {'analyzer_configs': [
                        {'key': 'FileSizeAccumulator',
                         'kwargs': {'unit': 'KB'}}]}}}},
            'test': ilsvrc_test(),
            'sweep': {'qualities': qualities,
                      'json_template':
                          '{"models": {"wrapper": {"kwargs": '
                          '{"codec_encoder_decoder": {"kwargs": '
                          '{"quality": %d}}}}}}'},
        }
        dump(CFG / 'ilsvrc2012/input_compression' /
             f'{codec}-resnet50.yaml', config)
    for codec, key in [('bpg', 'BPGModule'), ('vtm', 'VTMModule')]:
        config = {
            'dependencies': ['sc2bench_tpu.models',
                             'sc2bench_tpu.transforms'],
            'models': {'wrapper': {
                'key': 'CodecInputCompressionClassifier',
                'classification_model': {'key': 'resnet50',
                                         'kwargs': {'num_classes': 1000}},
                'kwargs': {
                    'codec_encoder_decoder': {
                        'key': key,
                        'kwargs': {'quality': 30,
                                   'returns_file_size': True}},
                    'post_transform': [
                        {'key': 'CustomToTensor', 'kwargs': {}},
                        {'key': 'Normalize', 'kwargs': {}}]}}},
            'test': ilsvrc_test(),
            'sweep': {'qualities': BPG_QUALITIES if codec == 'bpg'
                      else list(range(12, 52, 5))},
        }
        dump(CFG / 'ilsvrc2012/input_compression' /
             f'{codec}-resnet50.yaml', config)
    # neural input compression
    for family in NEURAL_FAMILIES:
        for q in NEURAL_QUALITIES:
            config = {
                'dependencies': ['sc2bench_tpu.models',
                                 'sc2bench_tpu.transforms'],
                'models': {'wrapper': {
                    'key': 'NeuralInputCompressionClassifier',
                    'classification_model': {'key': 'resnet50',
                                             'kwargs': {'num_classes': 1000}},
                    'compression_model': {
                        'key': family, 'kwargs': {'quality': q},
                        'ckpt': f'./resource/ckpt/codec/{family}-q{q}.ckpt'},
                    'kwargs': {
                        'pre_transform': [
                            {'key': 'AdaptivePad',
                             'kwargs': {'factor': 64}}],
                        'analysis_config': {
                            'analyzes_after_compress': True,
                            'analyzer_configs': [
                                {'key': 'FileSizeAnalyzer',
                                 'kwargs': {'unit': 'KB'}}]}}}},
                'test': ilsvrc_test(),
            }
            dump(CFG / 'ilsvrc2012/input_compression' /
                 f'{family}-q{q}-resnet50.yaml', config)


def gen_feature_compression():
    for codec, fmt in [('jpeg', 'JPEG'), ('webp', 'WEBP')]:
        config = {
            'dependencies': ['sc2bench_tpu.models',
                             'sc2bench_tpu.transforms'],
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


if __name__ == '__main__':
    gen_entropic_student()
    gen_end_to_end()
    gen_ghnd_bq()
    gen_fine_tuning()
    gen_input_compression()
    gen_feature_compression()
    n = len(list(CFG.rglob('*.yaml')))
    print(f'{n} configs under {CFG}')
