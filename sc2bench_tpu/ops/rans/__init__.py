from .coder import RansCoder, encode_with_indexes, decode_with_indexes  # noqa: F401
