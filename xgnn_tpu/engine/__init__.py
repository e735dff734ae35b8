from .shuffler import Shuffler  # noqa: F401
from .engine import Engine  # noqa: F401
