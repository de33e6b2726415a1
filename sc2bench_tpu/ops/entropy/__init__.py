from .factorized import EntropyBottleneck  # noqa: F401
from .gaussian import GaussianConditional, get_scale_table  # noqa: F401
from .tables import CodingTables  # noqa: F401
