from . import mesh  # noqa: F401
from . import collective  # noqa: F401
