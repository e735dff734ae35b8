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
