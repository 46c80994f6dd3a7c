from . import quality  # noqa: F401
from . import qserver  # noqa: F401
