"""Ordered frontier dedup + id remap.

TPU-native equivalent of the reference's versioned GPU ``OrderedHashTable``
(``samgraph/common/cuda/cuda_hashtable.h:35-153``) whose
``FillWithDuplicates`` returns the compact unique frontier *preserving
insertion order* and whose o2n map remaps edge endpoints to local ids
(``cuda/cuda_mapping.cu:1-85``).

Open-addressing hash tables are a poor fit for the VPU; instead we use a
sort-based formulation (3 sorts + scatters, all static shapes, fully
jittable).  Insertion-order preservation matters: when the previous frontier
is passed first in ``ids``, its nodes keep local ids ``0..len(prev)-1``, so
the destination nodes of a sampled block are a prefix of its source nodes —
the same self-alignment contract DGL blocks and the reference rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C

EMPTY = C.EMPTY_KEY


def compact_mask_positions(mask: jax.Array, out_cap: int) -> jax.Array:
    """Positions of True elements compacted to the front in original order,
    padded with ``n`` (the mask length) past the True count.

    The stable-compaction primitive of the miss/cold splits
    (``GetMissCacheIndex``, cuda_cache_manager_device.cu:41-170).  A stable
    ``argsort(~mask)`` sorts (key, iota) pairs — 8 bytes/element; here the
    position IS the payload: sort ``iota + n*(1-mask)`` (one unpayloaded
    int32 sort, half the bytes) and the True positions come out < n, in
    order, as a prefix.
    """
    n = mask.shape[0]
    key = jnp.arange(n, dtype=jnp.int32) + jnp.where(mask, 0, n).astype(
        jnp.int32
    )
    pos = jax.lax.sort(key)[:out_cap]
    return jnp.where(pos < n, pos, n)


def unique_ordered(ids: jax.Array, out_cap: int):
    """Deduplicate ``ids`` preserving first-occurrence order.

    Args:
      ids: ``(N,)`` int32 node ids, padded with ``EMPTY_KEY`` anywhere.
      out_cap: static capacity of the unique output.

    Returns:
      ``(unique_ids, num_unique, local_ids)`` where

      - ``unique_ids``: ``(out_cap,)`` unique ids in first-occurrence order,
        ``EMPTY_KEY``-padded.
      - ``num_unique``: scalar int32 (may exceed ``out_cap`` — caller must
        treat that as capacity overflow).
      - ``local_ids``: ``(N,)`` position of each input id in ``unique_ids``
        (``EMPTY_KEY`` for empty inputs).
    """
    n = ids.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(ids, stable=True)
    sid = ids[order]
    spos = pos[order]  # ascending within equal-id runs (stable sort)

    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]]
    ) & (sid != EMPTY)
    num_unique = jnp.sum(is_first).astype(jnp.int32)

    # Rank each run's first element by its original position → the
    # first-occurrence-order local id of that unique value.
    first_key = jnp.where(is_first, spos, n).astype(jnp.int32)
    occ_rank = jnp.argsort(jnp.argsort(first_key, stable=True), stable=True)
    occ_rank = occ_rank.astype(jnp.int32)

    # Propagate each run's local id to all of the run's elements.
    run_idx = jnp.maximum(jnp.cumsum(is_first) - 1, 0).astype(jnp.int32)
    run_occ = (
        jnp.zeros(n, jnp.int32)
        .at[run_idx]
        .max(jnp.where(is_first, occ_rank, 0), mode="drop")
    )
    local_sorted = run_occ[run_idx]

    # Scatter local ids back to original input order.
    local_ids = jnp.zeros(n, jnp.int32).at[spos].set(local_sorted)
    local_ids = jnp.where(ids == EMPTY, EMPTY, local_ids)

    # Compact unique values into first-occurrence order.
    unique_ids = (
        jnp.full(out_cap, EMPTY, ids.dtype)
        .at[jnp.where(is_first, occ_rank, out_cap)]
        .set(sid, mode="drop")
    )
    return unique_ids, num_unique, local_ids


def _forward_fill(values: jax.Array, flags: jax.Array) -> jax.Array:
    """At each position, the ``values`` entry of the nearest set ``flags``
    position at or before it (positions before the first set flag keep their
    input value).  O(log n) doubling, sequential-access only."""
    n = values.shape[0]
    v, f = values, flags
    shift = 1
    while shift < n:
        pv = jnp.concatenate([v[:shift], v[:-shift]])
        pf = jnp.concatenate([jnp.zeros(shift, jnp.bool_), f[:-shift]])
        v = jnp.where(f, v, pv)
        f = f | pf
        shift *= 2
    return v


def unique_seeded_packed(
    ids: jax.Array, num_prev: jax.Array, prev_cap: int, out_cap: int
):
    """Packed-key variant of :func:`unique_seeded`: every (key, payload)
    sort becomes ONE single-operand uint32-pair-free sort by packing key and
    payload into disjoint bit ranges of a float64-free int64 — XLA's
    single-key sort path is much faster than its variadic-comparator
    multi-operand path.  Stability falls out of the packing (payload in the
    low bits), so no stable flag is needed.

    Bit budget: node ids < 2^31, positions/local ids < 2^25 (33.5M) — callers
    with longer id vectors must use :func:`unique_seeded`.
    """
    n = ids.shape[0]
    assert n < (1 << 25) and out_cap < (1 << 25), (n, out_cap)
    pos = jnp.arange(n, dtype=jnp.int32)

    with jax.enable_x64(True):  # trace-local: i64 only for the packed keys
        # sort 1: by id, position in low bits (replaces the stable 2-op sort)
        k1 = (ids.astype(jnp.int64) << 25) | pos.astype(jnp.int64)
        s1 = jax.lax.sort((k1,), num_keys=1)[0]
        sid = (s1 >> 25).astype(jnp.int32)
        spos = (s1 & ((1 << 25) - 1)).astype(jnp.int32)

        is_first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]]
        ) & (sid != EMPTY)
        num_unique = jnp.sum(is_first).astype(jnp.int32)

        is_prev_first = is_first & (spos < prev_cap)
        new_rank = (
            jnp.cumsum(is_first & ~is_prev_first).astype(jnp.int32) - 1
        )
        local_first = jnp.where(is_prev_first, spos, num_prev + new_rank)
        local_sorted = _forward_fill(
            jnp.where(is_first, local_first, 0), is_first
        )

        # sort 2 (unsort): permutation key spos, local id in the low bits
        k2 = (spos.astype(jnp.int64) << 25) | local_sorted.astype(jnp.int64)
        s2 = jax.lax.sort((k2,), num_keys=1)[0]
        local_ids = (s2 & ((1 << 25) - 1)).astype(jnp.int32)
        local_ids = jnp.where(ids == EMPTY, EMPTY, local_ids)

        # sort 3 (compaction): local id in the high bits, node id low
        ckey = jnp.where(
            is_first, local_first, (1 << 25) - 1
        ).astype(jnp.int64)
        k3 = (ckey << 31) | sid.astype(jnp.int64)
        s3 = jax.lax.sort((k3,), num_keys=1)[0]
        uvals = (s3 & ((1 << 31) - 1)).astype(jnp.int32)
    if out_cap > n:
        uvals = jnp.concatenate(
            [uvals, jnp.full(out_cap - n, EMPTY, ids.dtype)]
        )
    valid_u = jnp.arange(out_cap) < jnp.minimum(num_unique, out_cap)
    unique_ids = jnp.where(valid_u, uvals[:out_cap], EMPTY)
    return unique_ids, num_unique, local_ids


def unique_seeded(
    ids: jax.Array, num_prev: jax.Array, prev_cap: int, out_cap: int
):
    """Dedup when a unique "seed" prefix is already known — the sampler's hot
    case: ``ids = concat(prev_frontier, neighbors)`` where the prev frontier
    (positions ``< prev_cap``, valid count ``num_prev``) is unique.

    Semantics differ from :func:`unique_ordered` only in the ordering of NEW
    nodes: prev-frontier nodes keep local ids ``0..num_prev-1`` (the
    correctness-critical dst-prefix property); new nodes follow in ascending
    id order instead of first-occurrence order — which nothing downstream
    depends on, and which needs only ONE argsort instead of three (the dedup
    sort dominates the sampling step at benchmark scale).
    """
    # Implementation note: everything here is multi-operand ``lax.sort`` +
    # scans + elementwise — NO scatters and NO permutation gathers.  Random
    # 4-byte scatter/gather runs at ~100M elem/s on TPU while sorts stream at
    # memory bandwidth, and scatters with colliding indices (hub runs in a
    # power-law frontier) degrade further — measured 3x end-to-end on the
    # sampler hot path.
    n = ids.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    sid, spos = jax.lax.sort((ids, pos), num_keys=1, is_stable=True)

    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]]
    ) & (sid != EMPTY)
    num_unique = jnp.sum(is_first).astype(jnp.int32)

    # a run belongs to the prev frontier iff its first element came from the
    # prefix (stable sort ⇒ that element carries the prev position = local id)
    is_prev_first = is_first & (spos < prev_cap)
    new_rank = jnp.cumsum(is_first & ~is_prev_first).astype(jnp.int32) - 1
    local_first = jnp.where(is_prev_first, spos, num_prev + new_rank)

    # propagate each run's local id to the run's other elements: forward fill
    # of the value at each run-first, via log-doubling shifts.  Hand-rolled
    # (not lax.associative_scan): the scan's generic lowering is heavy enough
    # at multi-million lengths to get remote compilers OOM-killed; this emits
    # ~4 trivial ops per doubling level.
    local_sorted = _forward_fill(jnp.where(is_first, local_first, 0), is_first)

    # back to original order: sort by position (a permutation ⇒ exact unsort)
    _, local_ids = jax.lax.sort((spos, local_sorted), num_keys=1)
    local_ids = jnp.where(ids == EMPTY, EMPTY, local_ids)

    # compact unique values into local-id order (third 2-operand sort)
    ckey = jnp.where(is_first, local_first, jnp.iinfo(jnp.int32).max)
    _, uvals = jax.lax.sort((ckey, sid), num_keys=1)
    if out_cap > n:  # capacity can exceed the id-vector length (calibration)
        uvals = jnp.concatenate(
            [uvals, jnp.full(out_cap - n, EMPTY, ids.dtype)]
        )
    valid_u = jnp.arange(out_cap) < jnp.minimum(num_unique, out_cap)
    unique_ids = jnp.where(valid_u, uvals[:out_cap], EMPTY)
    return unique_ids, num_unique, local_ids
