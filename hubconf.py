"""Hub-style model constructors (parity surface of
`/root/reference/hubconf.py:16-246`): one-call builders for the custom
bottleneck-injected classifiers and detectors. Each returns an
*uninitialized* Flax module; call `init_model(module)` (or
`sc2bench_tpu.train.engine.init_model`) to get variables.
"""
from sc2bench_tpu.models.backbone import (SplittableDenseNet,
                                          SplittableResNet)
from sc2bench_tpu.models.layer import get_layer

dependencies = ['jax', 'flax']


def _bottleneck(bottleneck_channel, bottleneck_idx, builder):
    return get_layer(builder, bottleneck_channel=bottleneck_channel,
                     bottleneck_idx=bottleneck_idx)


def custom_resnet50(bottleneck_channel=12, bottleneck_idx=7,
                    num_classes=1000, **kwargs):
    """GHND bottleneck-injected ResNet-50 (reference `hubconf.py:16`)."""
    return SplittableResNet(
        bottleneck_layer=_bottleneck(bottleneck_channel, bottleneck_idx,
                                     'larger_resnet_bottleneck'),
        stage_sizes=(3, 4, 6, 3), num_classes=num_classes)


def custom_resnet101(bottleneck_channel=12, bottleneck_idx=7,
                     num_classes=1000, **kwargs):
    return SplittableResNet(
        bottleneck_layer=_bottleneck(bottleneck_channel, bottleneck_idx,
                                     'larger_resnet_bottleneck'),
        stage_sizes=(3, 4, 23, 3), num_classes=num_classes)


def custom_resnet152(bottleneck_channel=12, bottleneck_idx=7,
                     num_classes=1000, **kwargs):
    return SplittableResNet(
        bottleneck_layer=_bottleneck(bottleneck_channel, bottleneck_idx,
                                     'larger_resnet_bottleneck'),
        stage_sizes=(3, 8, 36, 3), num_classes=num_classes)


def custom_densenet169(bottleneck_channel=12, bottleneck_idx=8,
                       num_classes=1000, **kwargs):
    return SplittableDenseNet(
        bottleneck_layer=_bottleneck(bottleneck_channel, bottleneck_idx,
                                     'larger_densenet_bottleneck'),
        block_config=(6, 12, 32, 32), num_classes=num_classes)


def custom_densenet201(bottleneck_channel=12, bottleneck_idx=8,
                       num_classes=1000, **kwargs):
    return SplittableDenseNet(
        bottleneck_layer=_bottleneck(bottleneck_channel, bottleneck_idx,
                                     'larger_densenet_bottleneck'),
        block_config=(6, 12, 48, 32), num_classes=num_classes)


def custom_inception_v3(bottleneck_channel=12, bottleneck_idx=7,
                        num_classes=1000, **kwargs):
    """InceptionV3 bottleneck (reference `hubconf.py:110-138`); served by the
    registered `inception_v3_bottleneck` layer over the ResNet tail-free
    feature path."""
    return _bottleneck(bottleneck_channel, bottleneck_idx,
                       'inception_v3_bottleneck')



def custom_resnet_fpn_backbone(backbone_key='custom_resnet50', layer1=None,
                               frozen_bn=True, **kwargs):
    """Bottleneck-as-layer1 ResNet backbone + FPN (reference
    `hubconf.py:141-173`): returns (backbone, fpn) flax modules — the pair
    `FasterRCNN` composes internally. `layer1` kwargs feed the
    layer1-replacing bottleneck builder; FrozenBatchNorm is the default
    norm as in torchvision detection backbones."""
    from sc2bench_tpu.models.detection.base import \
        SplittableDetectionBackbone
    from sc2bench_tpu.models.detection.fpn import FeaturePyramidNetwork
    stage_sizes = {'custom_resnet50': (3, 4, 6, 3),
                   'custom_resnet101': (3, 4, 23, 3),
                   'custom_resnet152': (3, 8, 36, 3)}[backbone_key]
    bneck = get_layer('larger_resnet_layer1_bottleneck', **(layer1 or {}))
    backbone = SplittableDetectionBackbone(
        bottleneck_layer=bneck, stage_sizes=stage_sizes,
        frozen_bn=frozen_bn)
    return backbone, FeaturePyramidNetwork(out_channels=256)

def custom_fasterrcnn_resnet_fpn(backbone='resnet50', bottleneck_channel=12,
                                 bottleneck_idx=8, num_classes=91, **kwargs):
    """Faster R-CNN with a layer1-replacing bottleneck backbone
    (reference `hubconf.py:176-208`)."""
    from sc2bench_tpu.models.detection.base import SplittableDetectionBackbone
    from sc2bench_tpu.models.detection.rcnn import FasterRCNN
    stage_sizes = {'resnet50': (3, 4, 6, 3),
                   'resnet101': (3, 4, 23, 3)}[backbone]
    bneck = _bottleneck(bottleneck_channel, bottleneck_idx,
                        'larger_resnet_layer1_bottleneck')
    return FasterRCNN(
        backbone=SplittableDetectionBackbone(bottleneck_layer=bneck,
                                             stage_sizes=stage_sizes),
        num_classes=num_classes)


def custom_maskrcnn_resnet_fpn(backbone='resnet50', bottleneck_channel=12,
                               bottleneck_idx=8, num_classes=91, **kwargs):
    """Mask R-CNN over the bottleneck backbone (reference `hubconf.py:210`)."""
    from sc2bench_tpu.models.detection.base import SplittableDetectionBackbone
    from sc2bench_tpu.models.detection.rcnn import MaskRCNN
    stage_sizes = {'resnet50': (3, 4, 6, 3),
                   'resnet101': (3, 4, 23, 3)}[backbone]
    bneck = _bottleneck(bottleneck_channel, bottleneck_idx,
                        'larger_resnet_layer1_bottleneck')
    return MaskRCNN(
        backbone=SplittableDetectionBackbone(bottleneck_layer=bneck,
                                             stage_sizes=stage_sizes),
        num_classes=num_classes)


def custom_keypointrcnn_resnet_fpn(backbone='resnet50', bottleneck_channel=12,
                                   bottleneck_idx=8, num_classes=2,
                                   num_keypoints=17, **kwargs):
    """Keypoint R-CNN over the bottleneck backbone (reference `hubconf.py:231`)."""
    from sc2bench_tpu.models.detection.base import SplittableDetectionBackbone
    from sc2bench_tpu.models.detection.rcnn import KeypointRCNN
    stage_sizes = {'resnet50': (3, 4, 6, 3),
                   'resnet101': (3, 4, 23, 3)}[backbone]
    bneck = _bottleneck(bottleneck_channel, bottleneck_idx,
                        'larger_resnet_layer1_bottleneck')
    return KeypointRCNN(
        backbone=SplittableDetectionBackbone(bottleneck_layer=bneck,
                                             stage_sizes=stage_sizes),
        num_classes=num_classes, num_keypoints=num_keypoints)
