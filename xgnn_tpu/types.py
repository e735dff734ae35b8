"""Core pytree types: device-resident graph, sampled blocks, batches.

TPU-native re-expression of the reference's ``TrainGraph``/``Task`` structs
(``samgraph/common/common.h:246-285``).  Instead of ragged per-layer COO
blocks, a sampled layer is a *dense fixed-fanout neighbor matrix*
``(dst_cap, fanout)`` of local src indices with an implicit validity mask
(``EMPTY_KEY`` padding): static shapes for XLA, and aggregation becomes a
masked gather+reduce that tiles directly onto the VPU/MXU.  A COO view is
provided for parity with the reference representation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import constants as C

EMPTY = C.EMPTY_KEY


@struct.dataclass
class Graph:
    """Device-resident CSR topology (+ optional weighted-sampling tables).

    The single-store analog of the reference's ``Dataset`` device tensors;
    partitioned variants live in ``xgnn_tpu.store``.
    """

    indptr: jax.Array  # (>= num_node + 1,) int32, tile-padded
    indices: jax.Array  # (>= num_edge,) int32, tile-padded
    prob_table: Optional[jax.Array] = None  # edge-aligned f32 (alias method)
    alias_table: Optional[jax.Array] = None  # edge-aligned int32
    prob_prefix_table: Optional[jax.Array] = None  # edge-aligned f32
    # (num_node, 128) f32 per-node CDF quantiles: one-tile coarse index that
    # replaces most prefix-search tile touches (ops/sampling.build_coarse_cdf)
    coarse_cdf: Optional[jax.Array] = None
    # logical sizes: arrays are padded to the gather tile (ops/tiled.py)
    n_node: Optional[int] = struct.field(pytree_node=False, default=None)
    n_edge: Optional[int] = struct.field(pytree_node=False, default=None)
    # static max out-degree: bounds the prefix-table binary-search depth
    # (ceil(log2(max_deg)) gathers per pick instead of 32)
    n_max_deg: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def num_node(self) -> int:
        return self.n_node if self.n_node is not None else self.indptr.shape[0] - 1

    @property
    def num_edge(self) -> int:
        return self.n_edge if self.n_edge is not None else self.indices.shape[0]

    @classmethod
    def from_dataset(cls, ds, device=None, weighted: bool = False) -> "Graph":
        from .ops.tiled import pad_tile

        put = lambda x: jax.device_put(
            jnp.asarray(pad_tile(np.asarray(x))), device
        )
        iptr = np.asarray(ds.indptr)
        if len(iptr) and int(iptr[-1]) >= 2**31:
            # device edge offsets are int32 by design (JAX x64 off): a
            # single-store device CSR cannot address >= 2^31 edges.  The
            # supported paths for such graphs REBASE offsets below 2^31 —
            # partitioned store at P >= 2 (partition_csr_host) or a clamped
            # hot prefix + int64 host tier (make_tiered_topology /
            # dist_graph_percentage); see parallel/ggms.py.
            raise ValueError(
                f"graph has {int(iptr[-1])} edges (>= 2^31): single-store "
                "device topology unsupported — use the partitioned store "
                "or a host-tier prefix"
            )
        if iptr.dtype != np.int32:
            iptr = iptr.astype(np.int32)
        iptr_padded = pad_tile(iptr, fill=int(iptr[-1]))
        g = cls(
            indptr=jax.device_put(jnp.asarray(iptr_padded), device),
            indices=put(ds.indices),
            prob_table=put(ds.prob_table) if weighted and ds.prob_table is not None else None,
            alias_table=put(ds.alias_table) if weighted and ds.alias_table is not None else None,
            prob_prefix_table=(
                put(ds.prob_prefix_table)
                if weighted and ds.prob_prefix_table is not None
                else None
            ),
            n_node=int(ds.num_node),
            n_edge=int(ds.num_edge),
            n_max_deg=int(np.max(np.diff(iptr))) if len(iptr) > 1 else None,
        )
        if g.prob_prefix_table is not None:
            from .ops.sampling import build_coarse_cdf

            g = g.replace(
                coarse_cdf=build_coarse_cdf(
                    g.indptr, g.prob_prefix_table, g.num_node
                )
            )
        return g


@struct.dataclass
class Block:
    """One sampled layer (reference ``TrainGraph``, common.h:246-253).

    ``neigh[i, k]`` is the local index (into the layer's src frontier) of the
    k-th sampled neighbor of dst node ``i``; ``EMPTY_KEY`` marks padding.
    Dst nodes are the first ``num_dst`` entries of the src frontier
    (self-alignment: local dst id == local src id).
    """

    neigh: jax.Array  # (dst_cap, fanout) int32 local src indices
    num_dst: jax.Array  # scalar int32 — valid dst rows
    num_src: jax.Array  # scalar int32 — valid src frontier entries
    weights: Optional[jax.Array] = None  # (dst_cap, fanout) f32 (PinSAGE)
    # direct-extract mode (the gpu_extract analog): ``neigh`` holds GLOBAL
    # node ids indexing the HBM feature table directly — no dedup/remap and
    # no separate extract stage for this layer.  ``dst_ids`` then carries the
    # dst rows' global ids (h_dst is no longer a prefix of h_src).
    dst_ids: Optional[jax.Array] = None  # (dst_cap,) int32 global ids

    @property
    def dst_cap(self) -> int:
        return self.neigh.shape[0]

    @property
    def fanout(self) -> int:
        return self.neigh.shape[1]

    @property
    def mask(self) -> jax.Array:
        return self.neigh != EMPTY

    def to_coo(self):
        """COO parity view: (row=dst local, col=src local, mask)."""
        row = jnp.broadcast_to(
            jnp.arange(self.dst_cap, dtype=jnp.int32)[:, None], self.neigh.shape
        )
        return row.reshape(-1), jnp.where(self.mask, self.neigh, 0).reshape(-1), (
            self.mask.reshape(-1)
        )


@struct.dataclass
class SampledBatch:
    """One mini-batch of sampled work (reference ``Task``, common.h:256-285).

    ``blocks`` are ordered outermost-first (DGL convention): ``blocks[0]``
    has the largest src frontier = ``input_nodes``; ``blocks[-1]``'s dst
    nodes are the seeds (= ``output_nodes``).
    """

    blocks: Sequence[Block]
    input_nodes: jax.Array  # (input_cap,) int32 global ids, EMPTY padded
    num_input: jax.Array  # scalar int32
    output_nodes: jax.Array  # (batch_cap,) int32 seed ids
    num_output: jax.Array  # scalar int32
    key: jax.Array  # batch id / step counter
    # True if any layer's unique frontier exceeded its static capacity — the
    # engine responds by re-building the sampler with grown capacities
    # (the PredictNumNodes analog, reference common.h:311-317).
    overflow: jax.Array = struct.field(default=None)

    @property
    def input_cap(self) -> int:
        return self.input_nodes.shape[0]
