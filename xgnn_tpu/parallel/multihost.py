"""Multi-host execution support.

The reference is single-node only (8 GPUs, one host; SURVEY §4.7) — this
extends the framework across hosts, per the BASELINE north star (edge-
partitioned graph across hosts, boundary exchange over ICI/DCN).

JAX's multi-controller model: every host runs the SAME program over a global
mesh spanning all processes; each host contributes its process-local shard of
every sharded array.  The collocated SPMD step (``parallel/collocated.py``)
is mesh-size-agnostic, so multi-host = the same step over a bigger mesh; the
pieces that change are array construction (process-local) and the shuffler
(each host feeds only its own chips — the DistShuffler per-worker sharding
already provides this).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from .mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """``jax.distributed.initialize`` wrapper (env-driven when args omitted —
    works out of the box on TPU pods where the runtime provides discovery)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def put_sharded_global(
    arr: np.ndarray, mesh: Mesh, axis_name: str = DATA_AXIS
):
    """Build a globally-sharded array from per-process local data.

    ``arr`` must be the GLOBAL array on every host (cheap metadata-wise for
    host-generated stores: each host only materializes the rows its local
    devices own via the callback).
    """
    sharding = NamedSharding(mesh, PS(axis_name, *([None] * (arr.ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def local_worker_ids(num_worker_total: int) -> Sequence[int]:
    """Global worker indices served by this process (one worker per local
    device, reference worker_id semantics)."""
    per = num_worker_total // jax.process_count()
    start = jax.process_index() * per
    return list(range(start, start + per))
