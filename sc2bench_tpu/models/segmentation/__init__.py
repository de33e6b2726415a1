from . import base, deeplabv3, registry, wrapper  # noqa: F401
