from . import base, rcnn, registry, transform, wrapper  # noqa: F401
