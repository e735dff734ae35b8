"""xgnn_tpu — a TPU-native mini-batch GNN training framework.

Built from scratch with the capabilities of the reference XGNN/SamGraph
system (lixiaobai09/xgnn): sampling-based multi-layer GNN training over
graphs larger than a single accelerator's memory, with a tiered/partitioned
Global GNN Memory Store, frequency-based hot-vertex caching, pipelined
sample→extract→train execution, and a GraphSAGE/GCN/GAT/PinSAGE model zoo —
re-designed for TPUs: JAX/XLA/Pallas compute, static-shape dense-fanout
blocks, `jax.sharding` meshes + collectives instead of NVLink P2P/IPC, and a
single host process per node instead of fork/shm pipelines.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: TPU compiles in this environment go
# through a slow tunnel (20-60s each); caching makes reruns start in seconds.
# Opt out with XGNN_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("XGNN_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.expanduser("~/.cache/xgnn_jax"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass

from .config import CachePolicy, RunArch, RunConfig, SampleType  # noqa: F401
from .dataset import Dataset, load_dataset, save_dataset  # noqa: F401
from .sampler import Sampler  # noqa: F401
from .types import Block, Graph, SampledBatch  # noqa: F401
