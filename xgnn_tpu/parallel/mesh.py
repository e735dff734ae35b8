"""Device mesh construction.

Replaces the reference's topology machinery (``PartitionSolver`` probing the
NVLink P2P bandwidth matrix, ``cuda/dist_graph.cu:684-938``): on TPU the ICI
topology is given and uniform within a slice, so "topology detection"
reduces to building a named mesh over the available chips.  The data axis
carries gradient psums (DDP analog); the same axis is used as the partition
dimension of the sharded GGMS store.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    num_groups: int,
    devices: Optional[Sequence] = None,
    axis_names: tuple = (DCN_AXIS, DATA_AXIS),
) -> Mesh:
    """Hierarchical (groups × chips-per-group) mesh — the TPU re-expression
    of the reference's topology-aware placement (``PartitionSolver``,
    dist_graph.cu:684-777): the GGMS store shards over the fast
    intra-group axis (ICI) and replicates across the slow inter-group axis
    (DCN/multi-host), so exchange collectives never cross the slow links
    while gradient psums ride both.  On one host the groups are a logical
    split (useful for validating the sharding); under multi-controller JAX
    the group axis spans hosts."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert len(devices) % num_groups == 0, (len(devices), num_groups)
    return Mesh(
        devices.reshape(num_groups, -1), axis_names
    )
