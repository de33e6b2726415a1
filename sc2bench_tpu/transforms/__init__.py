from . import codec, collator, misc  # noqa: F401
