from .unique import unique_ordered
from . import sampling  # noqa: F401
