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

    Sort-free: the owner key space is tiny (``P`` values), so each request's
    rank within its owner segment is a prefix count — ``P`` unrolled cumsums
    over the request vector — instead of an argsort of the whole frontier.
    Because ``(owner, rank)`` address every request's exchanged slot in
    REQUEST order, responses come back with a plain gather; no
    inverse-permutation scatter exists anywhere on the path (the round-2
    design paid an argsort here plus an F-wide ``.at[perm].set`` row scatter
    per feature exchange — ~1.3 GB/step at bench shapes).

    Returns ``(send, owner, rank, overflow)``: the per-peer request matrix,
    and per-request owner/rank (``owner == num_parts`` marks EMPTY slots).
    """
    valid = ids != EMPTY
    owner = jnp.where(valid, ids % num_parts, num_parts).astype(jnp.int32)
    rank = jnp.zeros(ids.shape[0], jnp.int32)
    for k in range(num_parts):
        mask = owner == k
        rank = rank + jnp.where(mask, jnp.cumsum(mask) - 1, 0)
    overflow = jnp.any((rank >= seg_cap) & valid)
    # 1-D linearized scatter (measured marginally faster than the (owner,
    # rank) 2-D form on chip — exchange_bench.tsv)
    tgt = jnp.where(
        (owner < num_parts) & (rank < seg_cap),
        owner * seg_cap + rank,
        num_parts * seg_cap,
    )
    send = (
        jnp.full(num_parts * seg_cap, EMPTY, ids.dtype)
        .at[tgt]
        .set(ids, mode="drop")
        .reshape(num_parts, seg_cap)
    )
    return send, owner, rank, overflow


def partitioned_gather_indirect(
    local_rows: jax.Array,
    ids: jax.Array,
    axis_name: str,
    seg_cap: int,
    *,
    translate=None,
):
    """Run the exchange but return the RAW response buffer + pick index,
    skipping the request-order materialization.

    Downstream gathers compose through ``pick`` instead of reading a
    materialized ``(cap, F)`` buffer: ``row_for_request[i] == buf[pick[i]]``
    with ``pick[i] == buf.shape[0]`` (one past the end — ``mode="fill"``
    zero-fills) for EMPTY/overflowed requests.  At bench shapes this removes
    a full (cap, F) write + re-read from the feature path (PERF.md round-3
    "indirect response" entry).

    Returns ``(buf, pick, overflow)``: ``buf`` is the ``(P*seg_cap, F)``
    response rows in (owner, rank) order; padding slots hold whatever row 0
    of the owner's table is — defined values, never addressed by any pick.
    """
    num_parts = jax.lax.axis_size(axis_name)
    # a per-peer segment can never need more slots than the request vector
    # has entries (rank is a prefix count over it) — at P=1 this deletes the
    # headroom padding outright, and a small request vector (labels: one
    # batch of seeds) never drags a full-frontier-sized exchange behind it
    seg_cap = min(seg_cap, ids.shape[0])
    send, owner, rank, overflow = plan_exchange(ids, num_parts, seg_cap)
    # phase 1: ship request ids to their owners
    req = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
    req = req.reshape(num_parts, seg_cap)
    # local serve
    req_valid = req != EMPTY
    local_idx = (
        translate(req) if translate is not None else req // num_parts
    )
    # padding slots must point at DISTINCT rows: repeated gather indices
    # COLLIDE on this chip (one shared dummy row at 20-45% padding drags the
    # whole gather from ~46 to 35-41 GB/s — collision_bench.tsv); spreading
    # them over consecutive rows restores the all-valid rate exactly
    spread = jnp.arange(req.size, dtype=jnp.int32).reshape(req.shape) % max(
        local_rows.shape[0], 1
    )
    local_idx = jnp.where(req_valid, local_idx, spread)
    rows = jnp.take(local_rows, local_idx.reshape(-1), axis=0, mode="clip")
    rows = rows.reshape(num_parts, seg_cap, -1)
    # no owner-side zeroing of padding slots: a padding slot is never
    # addressed by any requester's (owner, rank) pick, and the requester
    # masks its own EMPTY requests below — zeroing here costs a full
    # (P, seg, F) read+write pass for nothing
    # phase 2: ship rows back
    resp = jax.lax.all_to_all(rows, axis_name, 0, 0, tiled=True)
    buf = resp.reshape(num_parts * seg_cap, rows.shape[-1])
    # responses are addressed by (owner, rank) in request order already;
    # 1-D linearized pick (measured 40% faster than 2-D indexing on chip).
    # Invalid requests point one past the end: consumers either gather with
    # mode="fill" (zeros) or mask on their own EMPTY sentinels.
    ok = (owner < num_parts) & (rank < seg_cap)
    pick = jnp.where(ok, owner * seg_cap + rank, num_parts * seg_cap)
    return buf, pick, overflow


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
    buf, pick, overflow = partitioned_gather_indirect(
        local_rows, ids, axis_name, seg_cap, translate=translate
    )
    # mode="fill" zero-fills the out-of-range invalid picks directly in the
    # gather — no (cap, F) validity-mask multiply pass afterward
    out = jnp.take(buf, pick, axis=0, mode="fill", fill_value=0)
    return out, overflow
