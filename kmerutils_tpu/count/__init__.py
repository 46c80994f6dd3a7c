from . import exact  # noqa: F401
from . import filters  # noqa: F401
from . import dispatch  # noqa: F401
