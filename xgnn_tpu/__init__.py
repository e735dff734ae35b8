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

from .config import CachePolicy, RunArch, RunConfig, SampleType  # noqa: F401
from .dataset import Dataset, load_dataset, save_dataset  # noqa: F401
from .sampler import Sampler  # noqa: F401
from .types import Block, Graph, SampledBatch  # noqa: F401
