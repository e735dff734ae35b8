"""Neighbor sampling kernels (single-store path).

TPU-native re-expressions of the reference CUDA sampling kernels
(``samgraph/common/cuda/cuda_sampling_*.cu``; dispatch
``dist/dist_loops.cc:148-255``).  Every kernel maps a padded frontier
``(B,)`` to a dense neighbor matrix ``(B, K)`` with ``EMPTY_KEY`` padding —
static shapes, no data-dependent control flow, everything fuses under XLA.

Algorithm parity map:
- ``khop0/khop1`` (uniform *without* replacement, reservoir per warp in
  ``cuda_sampling_khop0.cu:102-153``) → vectorized partial Fisher-Yates:
  exact without-replacement for every degree, O(K^2) fused vector ops.
- ``khop2`` (with replacement, duplicates kept, ``cuda_sampling_khop2.cu``)
  → per-edge uniform picks.
- ``khop3`` (with replacement + per-node dedup via shared-memory hash set,
  ``cuda_sampling_khop3.cu:40-144``) → khop2 + in-row sort-dedup (duplicate
  picks masked to ``EMPTY_KEY``).
- ``weighted_khop`` (alias tables, ``cuda_sampling_weighted_khop.cu``) →
  vectorized alias draw.
- ``weighted_khop_prefix`` (prefix-sum binary search,
  ``cuda_sampling_weighted_khop_prefix.cu``) → branchless fixed-depth binary
  search per pick.
- ``weighted_khop_hash_dedup`` → alias draw + in-row dedup.
- random walk + top-K frequency lives in ``random_walk.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .tiled import take_1d

EMPTY = C.EMPTY_KEY


def _frontier_meta(indptr: jax.Array, frontier: jax.Array):
    """Per-node CSR slice (start, degree) with empty-entry masking.

    Tiled gathers (ops/tiled.py): scattered element reads are the sampler's
    bandwidth floor on TPU."""
    valid = frontier != EMPTY
    node = jnp.where(valid, frontier, 0)
    start = take_1d(indptr, node)
    deg = take_1d(indptr, node + 1) - start
    deg = jnp.where(valid, deg, 0)
    return node, start, deg, valid


def _mask_rows(nbr: jax.Array, deg: jax.Array) -> jax.Array:
    return jnp.where(deg[:, None] > 0, nbr, EMPTY)


def sample_khop2(indptr, indices, frontier, fanout: int, key) -> jax.Array:
    """Uniform with replacement; duplicates kept (reference khop2)."""
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    u = jax.random.uniform(key, (frontier.shape[0], fanout))
    off = jnp.floor(u * deg[:, None]).astype(jnp.int32)
    off = jnp.minimum(off, jnp.maximum(deg - 1, 0)[:, None])
    nbr = take_1d(indices, start[:, None] + off)
    return _mask_rows(nbr, deg)


def _dedup_rows(nbr: jax.Array) -> jax.Array:
    """Mask duplicate picks within each row (khop3's per-node hash set)."""
    s = jnp.sort(nbr, axis=1)  # EMPTY sorts last
    dup = jnp.concatenate(
        [jnp.zeros((s.shape[0], 1), jnp.bool_), s[:, 1:] == s[:, :-1]], axis=1
    )
    return jnp.where(dup, EMPTY, s)


def sample_khop3(indptr, indices, frontier, fanout: int, key) -> jax.Array:
    """With replacement + per-node dedup (reference khop3, XGNN default)."""
    return _dedup_rows(sample_khop2(indptr, indices, frontier, fanout, key))


def sample_khop0(indptr, indices, frontier, fanout: int, key) -> jax.Array:
    """Uniform *without* replacement (reference khop0/khop1).

    Vectorized partial Fisher-Yates over the virtual array ``A = [0..d)``:
    at step j draw ``t in [j, d)``, emit ``A[t]``, set ``A[t] = A[j]``.
    Positions ``< j`` are never revisited, so only displaced entries at
    positions ``>= j`` need recording; with K picks that is at most K sparse
    records, resolved by an O(K) scan per pick (O(K^2) total, fused on the
    VPU).  Exact for all degrees: when ``d <= K`` every neighbor is emitted
    exactly once (random order); when ``d > K`` picks are uniform without
    replacement.
    """
    b = frontier.shape[0]
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    u = jax.random.uniform(key, (b, fanout))

    rec_pos = []  # displaced positions, one per step
    rec_val = []  # value stored at that position
    picks = []

    def lookup(x):
        v = x
        for p, w in zip(rec_pos, rec_val):
            v = jnp.where(x == p, w, v)
        return v

    for j in range(fanout):
        span = jnp.maximum(deg - j, 1)
        t = j + jnp.minimum(
            jnp.floor(u[:, j] * span).astype(jnp.int32), span - 1
        )
        pick = lookup(t)
        a_j = lookup(jnp.full((b,), j, jnp.int32))
        rec_pos.append(t)
        rec_val.append(a_j)
        picks.append(jnp.where(j < deg, pick, 0))

    off = jnp.stack(picks, axis=1)
    nbr = take_1d(indices, start[:, None] + off)
    j_idx = jnp.arange(fanout, dtype=jnp.int32)[None, :]
    return jnp.where(j_idx < deg[:, None], nbr, EMPTY)


def sample_weighted_khop(
    indptr, indices, prob_table, alias_table, frontier, fanout: int, key
) -> jax.Array:
    """Weighted sampling via per-node alias tables (reference
    ``cuda_sampling_weighted_khop.cu``; tables from engine.cc:360-374)."""
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    k_slot, k_coin = jax.random.split(key)
    u = jax.random.uniform(k_slot, (frontier.shape[0], fanout))
    slot = jnp.minimum(
        jnp.floor(u * deg[:, None]).astype(jnp.int32),
        jnp.maximum(deg - 1, 0)[:, None],
    )
    edge = start[:, None] + slot
    coin = jax.random.uniform(k_coin, (frontier.shape[0], fanout))
    take_alias = coin >= take_1d(prob_table, edge)
    # alias_table entries are GLOBAL destination node ids, matching the
    # reference binary format (create_alias_table.cc:152 stores
    # indices[off+large_idx]; the CUDA kernel uses the entry directly as dst,
    # cuda_sampling_weighted_khop.cu:66-71) — no re-dereference through
    # ``indices``.
    nbr = jnp.where(
        take_alias, take_1d(alias_table, edge), take_1d(indices, edge)
    )
    return _mask_rows(nbr, deg)


def sample_weighted_khop_hash_dedup(
    indptr, indices, prob_table, alias_table, frontier, fanout: int, key
) -> jax.Array:
    """Alias draw + per-node dedup (reference
    ``cuda_sampling_weighted_khop_hash_dedup.cu``)."""
    return _dedup_rows(
        sample_weighted_khop(
            indptr, indices, prob_table, alias_table, frontier, fanout, key
        )
    )


def sample_weighted_khop_prefix(
    indptr, indices, prob_prefix_table, frontier, fanout: int, key,
    max_deg: int | None = None,
) -> jax.Array:
    """Weighted sampling by binary search in per-node prefix-sum tables
    (reference ``cuda_sampling_weighted_khop_prefix.cu``).

    Branchless binary search per pick — dynamic bounds, static control flow.
    Each iteration is one 512-byte tile gather per pick (the dominant cost),
    so the depth is sized to the graph: ``ceil(log2(max_deg)) + 1`` when the
    static max out-degree is known (``Graph.n_max_deg``), 32 otherwise.
    """
    b = frontier.shape[0]
    depth = 32
    if max_deg is not None:
        depth = min(32, max(1, int(np.ceil(np.log2(max(max_deg, 2)))) + 1))
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    safe_deg = jnp.maximum(deg, 1)
    total = take_1d(prob_prefix_table, start + safe_deg - 1)
    u = jax.random.uniform(key, (b, fanout)) * total[:, None]

    lo = jnp.zeros((b, fanout), jnp.int32)
    hi = jnp.broadcast_to(safe_deg[:, None] - 1, (b, fanout))
    # smallest off with prefix[start+off] > u
    for _ in range(depth):
        mid = (lo + hi) >> 1
        go_right = take_1d(prob_prefix_table, start[:, None] + mid) <= u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    off = jnp.minimum(lo, safe_deg[:, None] - 1)
    nbr = take_1d(indices, start[:, None] + off)
    return _mask_rows(nbr, deg)
