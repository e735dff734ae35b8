"""Partitioned-store access via batched collective exchange.

This is the central architectural translation of the GGMS (SURVEY §5.8): the
reference's device-side accessors issue *per-element* NVLink/host reads from
inside CUDA kernels (``DeviceDistGraph``/``DeviceDistFeature``,
``cuda/dist_graph.h:114-212``, served via CUDA IPC handles).  TPUs have no
cross-chip load/store into kernels — remote access must be *batched* — so a
partitioned read becomes a two-phase sorted exchange over ICI:

    sort requested ids by owner chip → all_to_all the id lists →
    every chip gathers its local rows → all_to_all the rows back →
    scatter into request order.

Partitioning is interleaved (owner = id % P, local row = id // P), matching
the reference's modulo placement (``dist_graph.h:132-151``) and balancing
both storage and request load.  All shapes are static: per-peer segments are
padded to ``seg_cap`` with overflow detection.

Functions here run *inside* ``shard_map`` over a named mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C

EMPTY = C.EMPTY_KEY


def shard_interleaved(arr, num_parts: int):
    """Host-side helper: rearrange rows so partition p holds rows
    ``p, p+P, p+2P, ...`` contiguously — returns ``(P, ceil(N/P), ...)``.

    Row ``g`` of the original array lands at ``[g % P, g // P]``.
    """
    import numpy as np

    n = arr.shape[0]
    rows = -(-n // num_parts)
    padded = np.zeros((num_parts * rows,) + arr.shape[1:], arr.dtype)
    padded[:n] = arr
    return np.ascontiguousarray(
        padded.reshape(rows, num_parts, *arr.shape[1:]).swapaxes(0, 1)
    )


def plan_exchange(ids: jax.Array, num_parts: int, seg_cap: int):
    """Group requested ids by owner into a ``(P, seg_cap)`` send buffer.

    Returns ``(send, perm, owner_sorted, rank, overflow)`` where ``send`` is
    the per-peer request matrix and (perm, owner_sorted, rank) locate each
    request for the return scatter.
    """
    cap = ids.shape[0]
    valid = ids != EMPTY
    owner = jnp.where(valid, ids % num_parts, num_parts)
    perm = jnp.argsort(owner, stable=True)
    owner_sorted = owner[perm]
    ids_sorted = ids[perm]
    counts = jnp.zeros(num_parts + 1, jnp.int32).at[owner].add(1)
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(cap, dtype=jnp.int32) - start[owner_sorted]
    overflow = jnp.any((rank >= seg_cap) & (owner_sorted < num_parts))
    send = (
        jnp.full((num_parts, seg_cap), EMPTY, ids.dtype)
        .at[jnp.where(owner_sorted < num_parts, owner_sorted, num_parts), rank]
        .set(ids_sorted, mode="drop")
    )
    return send, perm, owner_sorted, rank, overflow


def partitioned_gather(
    local_rows: jax.Array,
    ids: jax.Array,
    axis_name: str,
    seg_cap: int,
    *,
    translate=None,
):
    """Gather rows of an interleave-partitioned table (runs inside shard_map).

    Args:
      local_rows: ``(rows_per_part, F)`` this chip's partition; global row
        ``g`` lives on chip ``g % P`` at local index ``g // P``.
      ids: ``(cap,)`` requested global row ids, ``EMPTY_KEY``-padded.
      axis_name: mesh axis over which the table is partitioned.
      seg_cap: static per-peer segment capacity.
      translate: optional fn mapping received global ids → local row ids
        (default ``g // P``).

    Returns:
      ``(out, overflow)``: ``(cap, F)`` rows (zeros for EMPTY/overflowed) and
      a bool overflow flag (exchange must be retried with larger ``seg_cap``).
    """
    num_parts = jax.lax.axis_size(axis_name)
    send, perm, owner_sorted, rank, overflow = plan_exchange(
        ids, num_parts, seg_cap
    )
    # phase 1: ship request ids to their owners
    req = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
    req = req.reshape(num_parts, seg_cap)
    # local serve
    req_valid = req != EMPTY
    local_idx = (
        translate(req) if translate is not None else req // num_parts
    )
    local_idx = jnp.where(req_valid, local_idx, 0)
    rows = jnp.take(local_rows, local_idx.reshape(-1), axis=0, mode="clip")
    rows = rows.reshape(num_parts, seg_cap, -1)
    rows = rows * req_valid[..., None].astype(rows.dtype)
    # phase 2: ship rows back
    resp = jax.lax.all_to_all(rows, axis_name, 0, 0, tiled=True)
    resp = resp.reshape(num_parts, seg_cap, rows.shape[-1])
    # un-permute into request order
    safe_owner = jnp.minimum(owner_sorted, num_parts - 1)
    safe_rank = jnp.clip(rank, 0, seg_cap - 1)
    picked = resp[safe_owner, safe_rank]
    picked = picked * (owner_sorted < num_parts)[:, None].astype(picked.dtype)
    out = jnp.zeros_like(picked).at[perm].set(picked)
    return out, overflow
