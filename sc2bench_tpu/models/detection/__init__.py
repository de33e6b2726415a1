from . import base, rcnn, registry, retinanet, transform, wrapper  # noqa: F401
