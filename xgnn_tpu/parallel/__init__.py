from .mesh import make_mesh  # noqa: F401
from .exchange import partitioned_gather, shard_interleaved  # noqa: F401
