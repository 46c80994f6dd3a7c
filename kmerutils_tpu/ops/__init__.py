from . import bitops  # noqa: F401
from . import rng  # noqa: F401
