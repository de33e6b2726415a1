"""Importing this package populates the model/layer/wrapper registries
(the reference's `dependencies`-triggered registration, SURVEY.md §5.6)."""
from . import backbone, entropic, layer, registry, resnet, wrapper, zoo  # noqa: F401
from . import efficientnet, hybrid_vit, inception, regnet, resnest, zoo_jahp  # noqa: F401
from . import detection, segmentation  # noqa: F401
