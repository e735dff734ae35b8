"""Partitioned graph topology with remote sampling (the ``--use-dist-graph``
GGMS path).

The reference partitions CSR by interleaved node id across GPU memories and
lets sampling kernels dereference remote rows element-by-element over NVLink
(``DeviceDistGraph``, ``cuda/dist_graph.h:114-158``; partitioning
``dist_graph.cu:228-272``).  The TPU re-design goes further than batching the
*reads*: it ships the *sampling* to the owner chip —

    sort frontier by owner → all_to_all the (node, seed) requests →
    the owner draws K neighbors per request from its local CSR rows →
    all_to_all the fixed-size (K,) results back.

This bounds remote traffic at O(frontier × K) ids regardless of degree —
strictly less than shipping adjacency lists, and each chip's draw uses plain
local-CSR kernels.  Per-request RNG keys are derived from (step key, node id)
so results are independent of which chip issued the request.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import SampleType
from ..ops import sampling
from .exchange import plan_exchange

EMPTY = C.EMPTY_KEY


def partition_csr_host(indptr: np.ndarray, indices: np.ndarray, num_parts: int):
    """Interleave-partition a CSR on the host: part p owns rows p, p+P, ...

    Returns ``(local_indptrs, local_indices)`` stacked as
    ``(P, rows+1)`` / ``(P, max_edges)`` (EMPTY-padded) ready for
    ``put_sharded``.  Row ``v`` of the global graph is local row ``v // P``
    of part ``v % P``.
    """
    from ..ops.tiled import TILE

    num_node = len(indptr) - 1
    rows = -(-num_node // num_parts)
    iptr_len = -(-(rows + 1) // TILE) * TILE
    local_iptr = np.zeros((num_parts, iptr_len), np.int32)
    locals_idx = []
    max_edges = 0
    for p in range(num_parts):
        own = np.arange(p, num_node, num_parts)
        degs = indptr[own + 1] - indptr[own]
        li = np.zeros(iptr_len, np.int64)
        li[1 : len(own) + 1] = np.cumsum(degs)
        li[len(own) + 1 :] = li[len(own)]
        parts = [indices[indptr[v] : indptr[v + 1]] for v in own]
        le = (
            np.concatenate(parts) if parts else np.empty(0, indices.dtype)
        )
        local_iptr[p] = li.astype(np.int32)
        locals_idx.append(le)
        max_edges = max(max_edges, len(le))
    max_edges = -(-max(max_edges, 1) // TILE) * TILE
    local_idx = np.full((num_parts, max_edges), 0, np.int32)
    for p, le in enumerate(locals_idx):
        local_idx[p, : len(le)] = le
    return local_iptr, local_idx


def _owner_sample(local_indptr, local_indices, req_ids, fanout, key, sample_type):
    """Draw K neighbors for each requested global id from local CSR rows.

    ``req_ids``: (P, S) global node ids owned by this chip (EMPTY padded).
    Per-request keys derive from (key, node id): chip-independent.
    """
    num_parts = req_ids.shape[0]
    flat = req_ids.reshape(-1)
    local_rows = jnp.where(flat != EMPTY, flat // num_parts, EMPTY)
    data = jax.random.key_data(key).astype(jnp.uint32)
    # cheap per-request key derivation: xor-fold the node id into the key
    mixed = data[None, :] ^ (
        jnp.where(flat != EMPTY, flat, 0).astype(jnp.uint32)[:, None]
        * jnp.uint32(0x9E3779B9)
    )
    keys = jax.vmap(jax.random.wrap_key_data)(mixed)

    st = SampleType
    fn = {
        st.KHOP0: sampling.sample_khop0,
        st.KHOP1: sampling.sample_khop0,
        st.KHOP2: sampling.sample_khop2,
        st.KHOP3: sampling.sample_khop3,
    }[sample_type]

    # one vmapped draw per request row: each request is a 1-frontier sample
    def one(row, k):
        return fn(local_indptr, local_indices, row[None], fanout, k)[0]

    out = jax.vmap(one)(local_rows, keys)  # (P*S, K)
    return out.reshape(num_parts, req_ids.shape[1], fanout)


def sample_layer_partitioned(
    local_indptr: jax.Array,
    local_indices: jax.Array,
    frontier: jax.Array,
    fanout: int,
    key: jax.Array,
    axis_name: str,
    seg_cap: int,
    sample_type: SampleType = SampleType.KHOP3,
):
    """One sampling layer over the partitioned topology (inside shard_map).

    Returns ``(neigh (cap, K) global ids, overflow)``.
    """
    num_parts = jax.lax.axis_size(axis_name)
    send, perm, owner_sorted, rank, overflow = plan_exchange(
        frontier, num_parts, seg_cap
    )
    req = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
    req = req.reshape(num_parts, seg_cap)
    drawn = _owner_sample(
        local_indptr, local_indices, req, fanout, key, sample_type
    )
    resp = jax.lax.all_to_all(drawn, axis_name, 0, 0, tiled=True)
    resp = resp.reshape(num_parts, seg_cap, fanout)
    safe_owner = jnp.minimum(owner_sorted, num_parts - 1)
    safe_rank = jnp.clip(rank, 0, seg_cap - 1)
    picked = resp[safe_owner, safe_rank]  # (cap, K), sorted order
    picked = jnp.where(
        (owner_sorted < num_parts)[:, None], picked, EMPTY
    )
    neigh = jnp.full_like(picked, EMPTY).at[perm].set(picked)
    return neigh, overflow


def sample_minibatch_partitioned(
    local_indptr: jax.Array,
    local_indices: jax.Array,
    seeds: jax.Array,
    num_seed: jax.Array,
    key: jax.Array,
    *,
    axis_name: str,
    seg_cap: int,
    sample_type: SampleType,
    fanouts: Sequence[int],
    capacities: Sequence[int],
):
    """Multi-layer sampling over the partitioned topology (inside shard_map).

    Mirrors ``sampler._sample_minibatch`` but each layer's neighbor draw goes
    through the owner-side exchange.  Frontier dedup/remap stays chip-local.
    """
    from ..ops import unique
    from ..types import Block, SampledBatch

    frontier = seeds
    num_frontier = num_seed
    blocks = []
    overflow = jnp.zeros((), jnp.bool_)
    for layer, fanout in enumerate(fanouts):
        key, k_layer = jax.random.split(key)
        nbr, of = sample_layer_partitioned(
            local_indptr, local_indices, frontier, fanout, k_layer,
            axis_name, seg_cap, sample_type,
        )
        overflow = overflow | of
        ids = jnp.concatenate([frontier, nbr.reshape(-1)])
        out_cap = capacities[layer + 1]
        uids, num_unique, local = unique.unique_seeded(
            ids, num_frontier, frontier.shape[0], out_cap
        )
        blocks.append(
            Block(
                neigh=local[frontier.shape[0] :].reshape(nbr.shape),
                num_dst=num_frontier,
                num_src=num_unique,
            )
        )
        overflow = overflow | (num_unique > out_cap)
        frontier = uids
        num_frontier = jnp.minimum(num_unique, out_cap)
    blocks.reverse()
    return SampledBatch(
        blocks=tuple(blocks),
        input_nodes=frontier,
        num_input=num_frontier,
        output_nodes=seeds,
        num_output=num_seed,
        key=key,
        overflow=overflow,
    )
