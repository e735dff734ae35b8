"""Neighbor sampling kernels (single-store path).

TPU-native re-expressions of the reference CUDA sampling kernels
(``samgraph/common/cuda/cuda_sampling_*.cu``; dispatch
``dist/dist_loops.cc:148-255``).  Every kernel maps a padded frontier
``(B,)`` to a dense neighbor matrix ``(B, K)`` with ``EMPTY_KEY`` padding —
static shapes, no data-dependent control flow, everything fuses under XLA.

Algorithm parity map (distributions verified against the reference kernels,
not their names — three of the four uniform kernels are the SAME
distribution, uniform *without* replacement over the neighbor set, and only
khop1 draws with replacement):

- ``khop0`` (per-warp reservoir, ``cuda_sampling_khop0.cu:102-153``):
  uniform K-subset; all neighbors when ``deg <= K``.
- ``khop2`` (the shipped ``ORIGIN_KHOP2`` variant is an IN-PLACE partial
  Fisher-Yates over the shared ``indices`` rows,
  ``cuda_sampling_khop2.cu:36,78-92``): uniform K-subset; all neighbors
  when ``deg <= K``.  (The name suggests with-replacement; the compiled
  kernel is not.)
- ``khop3`` (shared-memory hash set drawing ``while (count < fanout)``
  until K DISTINCT offsets are collected, ``cuda_sampling_khop3.cu:126-137``;
  all neighbors when ``deg <= K``, :113-124): first-K-distinct of uniform
  with-replacement draws == uniform K-subset (each new distinct pick is
  uniform over the remaining neighbors).  khop3 is khop0's distribution with
  a GGMS-friendlier GPU thread mapping — NOT khop2+dedup, which can return
  fewer than ``min(K, deg)`` picks.
  All three therefore share one TPU kernel: vectorized partial Fisher-Yates
  (exact without-replacement for every degree, O(K^2) fused vector ops).
- ``khop1`` (one thread per (node, pick) draws *with* replacement
  ``cuda_sampling_khop1.cu:42-73``, then a radix sort + adjacent-compact
  removes duplicate (src, dst) pairs, :75-130,167-196) → per-pick uniform
  draw + in-row sort-dedup.  The with-replacement OUTLIER: it returns fewer
  than ``min(K, deg)`` distinct picks when draws collide (birthday
  statistic), and never emits a full low-degree row deterministically.
- ``weighted_khop`` (alias tables, ``cuda_sampling_weighted_khop.cu:55-77``)
  → vectorized alias draw, duplicates kept.  (The reference compacts only
  ADJACENT duplicate pairs without sorting first, :78-97 — effectively
  keep-all; we keep all.)
- ``weighted_khop_prefix`` (prefix-sum-table binary search,
  ``cuda_sampling_weighted_khop_prefix.cu``) → branchless fixed-depth binary
  search per pick (with replacement, as the reference).
- ``weighted_khop_hash_dedup`` (hash set drawing alias picks ``for (;
  selected_unique < fanout;)`` until K DISTINCT,
  ``cuda_sampling_weighted_khop_hash_dedup.cu:98-108``; all neighbors when
  ``deg <= fanout``, :85-95): weighted successive sampling without
  replacement.  TPU kernel: first-K-distinct over ``rounds * K`` bounded
  alias draws (exact while enough draws land distinct; the reference loops
  unboundedly — deviation documented in PARITY.md).
- random walk + top-K frequency lives in ``random_walk.py``; its per-step
  draws are uniform WITH replacement (:func:`sample_uniform_wr`), matching
  the walk kernel's independent ``curand % len`` steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .tiled import TILE as TILE_LANES, take_1d

EMPTY = C.EMPTY_KEY


def _frontier_meta(indptr: jax.Array, frontier: jax.Array):
    """Per-node CSR slice (start, degree) with empty-entry masking.

    Tiled gathers (ops/tiled.py): scattered element reads are the sampler's
    bandwidth floor on TPU.

    EMPTY entries map to DISTINCT spread-out nodes, not node 0: repeated
    gather indices COLLIDE on this chip (parking 30% of a frontier's picks
    on one tile makes the whole pick gather 1.55x slower —
    collision_bench.tsv), and a frontier at its static cap is routinely
    20-45% EMPTY padding.  The spread rows' degrees are masked to 0, so
    every downstream pick they produce is masked to EMPTY — outputs are
    bit-identical to the node-0 mapping."""
    valid = frontier != EMPTY
    n = max(indptr.shape[0] - 1, 1)
    # stride ~TILE so consecutive padding slots land in different indptr
    # tiles and produce distinct (random-looking) CSR starts
    spread = (
        jnp.arange(frontier.shape[0], dtype=jnp.int32) * jnp.int32(127)
    ) % n
    node = jnp.where(valid, frontier, spread)
    start = take_1d(indptr, node)
    deg = take_1d(indptr, node + 1) - start
    deg = jnp.where(valid, deg, 0)
    return node, start, deg, valid


def _mask_rows(nbr: jax.Array, deg: jax.Array) -> jax.Array:
    return jnp.where(deg[:, None] > 0, nbr, EMPTY)


def sample_uniform_wr(
    indptr, indices, frontier, fanout: int, key=None, *, u=None
) -> jax.Array:
    """Uniform WITH replacement; duplicates kept.

    The shared with-replacement core: khop1's draw stage and random-walk
    steps (each walker's ``curand % len``,
    ``cuda_sampling_random_walk.cu``).  Not a reference SampleType by
    itself — the reference's khop2 is Fisher-Yates, see module docstring.

    ``u``: optional pre-drawn ``(B, fanout)`` uniforms — the partitioned
    owner path derives them per REQUEST (key x node x slot) so draws are
    independent of the requesting chip (dist_topology._owner_sample)."""
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    if u is None:
        u = jax.random.uniform(key, (frontier.shape[0], fanout))
    off = jnp.floor(u * deg[:, None]).astype(jnp.int32)
    off = jnp.minimum(off, jnp.maximum(deg - 1, 0)[:, None])
    nbr = take_1d(indices, start[:, None] + off)
    return _mask_rows(nbr, deg)


def _dedup_rows(nbr: jax.Array) -> jax.Array:
    """Mask duplicate picks within each row (khop1's duplicate-pair
    compact)."""
    s = jnp.sort(nbr, axis=1)  # EMPTY sorts last
    dup = jnp.concatenate(
        [jnp.zeros((s.shape[0], 1), jnp.bool_), s[:, 1:] == s[:, :-1]], axis=1
    )
    return jnp.where(dup, EMPTY, s)


def sample_khop1(
    indptr, indices, frontier, fanout: int, key=None, *, u=None
) -> jax.Array:
    """Sample-parallel uniform draw + duplicate-pair removal (reference
    khop1): each of the K slots draws independently with replacement
    (``cuda_sampling_khop1.cu:42-73``), then duplicate (src, dst) pairs are
    sorted and compacted away (:75-130,167-196).  The with-replacement
    outlier of the khop family — returns fewer than ``min(K, deg)`` picks
    when draws collide (birthday statistic)."""
    return _dedup_rows(
        sample_uniform_wr(indptr, indices, frontier, fanout, key, u=u)
    )


def sample_khop0(
    indptr, indices, frontier, fanout: int, key=None, *, u=None
) -> jax.Array:
    """Uniform *without* replacement (reference khop0's reservoir; also the
    distribution of reference khop2 (in-place shuffle) and khop3
    (draw-until-K-distinct) — see module docstring).

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
    if u is None:
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


def sample_khop2(
    indptr, indices, frontier, fanout: int, key=None, *, u=None
) -> jax.Array:
    """Uniform without replacement (the reference's compiled khop2 is an
    in-place partial Fisher-Yates, ``cuda_sampling_khop2.cu:36,78-92`` —
    NOT with-replacement despite the historical name).  Shares the
    :func:`sample_khop0` kernel; with-replacement draws live in
    :func:`sample_uniform_wr`."""
    return sample_khop0(indptr, indices, frontier, fanout, key, u=u)


def sample_khop3(
    indptr, indices, frontier, fanout: int, key=None, *, u=None
) -> jax.Array:
    """Uniform without replacement (reference khop3, the XGNN default,
    draws ``while (count < fanout)`` until K DISTINCT offsets are in its
    shared-memory hash set, ``cuda_sampling_khop3.cu:126-137`` — the
    first-K-distinct of with-replacement draws IS the uniform K-subset
    distribution, and low-degree rows emit every neighbor, :113-124).  The
    reference keeps three uniform-without-replacement kernels because their
    GPU thread mappings differ (khop3's group-of-threads mapping coalesces
    GGMS remote reads); on TPU one Fisher-Yates kernel serves all three."""
    return sample_khop0(indptr, indices, frontier, fanout, key, u=u)


def sample_weighted_khop(
    indptr, indices, prob_table, alias_table, frontier, fanout: int,
    key=None, *, u=None, coin=None,
) -> jax.Array:
    """Weighted sampling via per-node alias tables (reference
    ``cuda_sampling_weighted_khop.cu``; tables from engine.cc:360-374)."""
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    if u is None:
        k_slot, k_coin = jax.random.split(key)
        u = jax.random.uniform(k_slot, (frontier.shape[0], fanout))
        coin = jax.random.uniform(k_coin, (frontier.shape[0], fanout))
    slot = jnp.minimum(
        jnp.floor(u * deg[:, None]).astype(jnp.int32),
        jnp.maximum(deg - 1, 0)[:, None],
    )
    edge = start[:, None] + slot
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


HASH_DEDUP_ROUNDS = 4  # bounded-rejection rounds (rounds*K alias draws)


def sample_weighted_khop_hash_dedup(
    indptr, indices, prob_table, alias_table, frontier, fanout: int,
    key=None, *, u=None, coin=None, rounds: int = HASH_DEDUP_ROUNDS,
) -> jax.Array:
    """Weighted successive sampling without replacement (reference
    ``cuda_sampling_weighted_khop_hash_dedup.cu``): the CUDA kernel draws
    alias picks ``for (; selected_unique < fanout;)`` until K DISTINCT
    neighbors are in its hash set (:98-108) and emits the FULL row when
    ``deg <= fanout`` (:85-95).

    TPU re-expression: ``rounds * K`` alias draws per node, then the
    first-K-distinct *in draw order* — identical distribution whenever K
    distinct values appear among the bounded draws (the reference loops
    unboundedly; under extreme weight skew this kernel can return fewer
    than K — deviation recorded in PARITY.md).  First-occurrence selection
    is two ``lax.sort`` passes over the M=rounds*K draws per row: stable
    (value, slot) sort marks group leaders, a second sort by first-slot
    restores draw order.

    ``u``/``coin``: optional pre-drawn ``(B, rounds*fanout)`` uniforms from
    the partitioned owner path."""
    b = frontier.shape[0]
    m = rounds * fanout
    _, start, deg, _ = _frontier_meta(indptr, frontier)
    if u is None:
        k_slot, k_coin = jax.random.split(key)
        u = jax.random.uniform(k_slot, (b, m))
        coin = jax.random.uniform(k_coin, (b, m))
    slot = jnp.minimum(
        jnp.floor(u * deg[:, None]).astype(jnp.int32),
        jnp.maximum(deg - 1, 0)[:, None],
    )
    edge = start[:, None] + slot
    take_alias = coin >= take_1d(prob_table, edge)
    val = jnp.where(
        take_alias, take_1d(alias_table, edge), take_1d(indices, edge)
    )
    # first-occurrence rank per distinct value, then first K in draw order
    slot_ids = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :], (b, m)
    )
    val_s, idx_s = jax.lax.sort((val, slot_ids), dimension=1, num_keys=2)
    lead = jnp.concatenate(
        [jnp.ones((b, 1), jnp.bool_), val_s[:, 1:] != val_s[:, :-1]], axis=1
    )
    first_slot = jnp.where(lead, idx_s, m)  # non-leaders sort to the back
    ord_slot, ord_val = jax.lax.sort((first_slot, val_s), dimension=1,
                                     num_keys=1)
    picked = jnp.where(ord_slot[:, :fanout] < m, ord_val[:, :fanout], EMPTY)
    # deg <= K: the reference emits the full neighbor row
    j = jnp.arange(fanout, dtype=jnp.int32)[None, :]
    full = take_1d(
        indices, start[:, None] + jnp.minimum(j, jnp.maximum(deg - 1, 0)[:, None])
    )
    full = jnp.where(j < deg[:, None], full, EMPTY)
    out = jnp.where((deg <= fanout)[:, None], full, picked)
    return _mask_rows(out, deg)


def _coarse_pos(j, deg, lanes: int):
    """Offset of the j-th coarse quantile of a row: ``ceil((j+1)*deg/lanes)-1``
    computed int32-overflow-safe via ``deg = q*lanes + r`` decomposition."""
    q, r = deg // lanes, deg % lanes
    return (j + 1) * q + ((j + 1) * r + lanes - 1) // lanes - 1


def build_coarse_cdf(indptr, prob_prefix_table, num_node: int,
                     lanes: int = 128):
    """Per-node tile-granular CDF index: ``(num_node, lanes)`` f32 where
    ``C[v, j] = prefix[start_v + ceil((j+1)*deg_v/lanes) - 1]`` — the row's
    CDF sampled at ``lanes`` evenly-spaced offsets, one HBM tile per node.

    This is the TPU-native answer to the prefix search's cost structure:
    every binary-search iteration is a 512-byte tile touch PER PICK, while a
    coarse row is ONE tile shared by all of a node's picks and narrows the
    interval by ``lanes``x in a single on-chip compare — see
    :func:`sample_weighted_khop_prefix`.  One-time build, ~4 bytes*lanes per
    node.
    """
    d = jnp.diff(indptr[: num_node + 1])
    start = indptr[:num_node]
    j = jnp.arange(lanes, dtype=jnp.int32)[None, :]
    e = _coarse_pos(j, jnp.maximum(d, 1)[:, None], lanes)
    pos = start[:, None] + jnp.clip(e, 0, jnp.maximum(d - 1, 0)[:, None])
    # one-time build: native XLA gather, NOT take_1d — the tiled gather's
    # (elements, TILE) select intermediate is ~``num_node*lanes*512`` bytes
    # (160 GB at products scale); the plain gather peaks at the output size
    c = jnp.take(prob_prefix_table, pos, mode="clip")
    return jnp.where((d > 0)[:, None], c, 0.0)


def sample_weighted_khop_prefix(
    indptr, indices, prob_prefix_table, frontier, fanout: int, key=None,
    max_deg: int | None = None, coarse_cdf=None, *, u=None,
) -> jax.Array:
    """Weighted sampling by binary search in per-node prefix-sum tables
    (reference ``cuda_sampling_weighted_khop_prefix.cu``).

    Branchless binary search per pick — dynamic bounds, static control flow.
    Each iteration is one 512-byte tile gather per pick (the dominant cost),
    so the depth is sized to the graph: ``ceil(log2(max_deg)) + 1`` when the
    static max out-degree is known (``Graph.n_max_deg``), 32 otherwise.

    With ``coarse_cdf`` (:func:`build_coarse_cdf`), the search is
    restructured around tile touches instead of comparisons: ONE coarse-row
    gather per dst (shared by all K picks) narrows the interval ``lanes``x
    on-chip, a few sized binary iterations shrink it under one tile, and a
    final tile-PAIR read finishes the whole search with a lane count —
    ~3 tile touches per pick instead of ~``log2(max_deg)``.  Exact: returns
    the same offset as the pure binary search for identical draws.
    """
    b = frontier.shape[0]
    depth = 32
    if max_deg is not None:
        depth = min(32, max(1, int(np.ceil(np.log2(max(max_deg, 2)))) + 1))
    node, start, deg, _ = _frontier_meta(indptr, frontier)
    safe_deg = jnp.maximum(deg, 1)
    total = take_1d(prob_prefix_table, start + safe_deg - 1)
    if u is None:
        u = jax.random.uniform(key, (b, fanout))
    u = u * total[:, None]

    if coarse_cdf is None:
        lo = jnp.zeros((b, fanout), jnp.int32)
        hi = jnp.broadcast_to(safe_deg[:, None] - 1, (b, fanout))
        iters = depth
    else:
        lanes = coarse_cdf.shape[1]
        crow = jnp.take(coarse_cdf, node, axis=0, mode="clip")  # (b, lanes)
        j = jnp.sum(crow[:, None, :] <= u[:, :, None], axis=-1,
                    dtype=jnp.int32)
        j = jnp.minimum(j, lanes - 1)  # f32 rounding can push u to total
        d2 = safe_deg[:, None]
        e_j = jnp.clip(_coarse_pos(j, d2, lanes), 0, d2 - 1)
        e_prev = jnp.clip(_coarse_pos(j - 1, d2, lanes), -1, d2 - 1)
        lo = jnp.where(j > 0, e_prev + 1, 0)
        hi = e_j
        # shrink the bucket below one tile span; bound is static
        span = 1 if max_deg is None else -(-max_deg // lanes)
        iters = 0
        while span > TILE_LANES - 1:
            span = (span + 1) // 2
            iters += 1
    # smallest off with prefix[start+off] > u
    for _ in range(iters):
        mid = (lo + hi) >> 1
        go_right = take_1d(prob_prefix_table, start[:, None] + mid) <= u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    if coarse_cdf is not None:
        # finish on-chip: the [lo, hi] prefix values live in two adjacent
        # tiles — read the pair, count entries <= u inside the interval
        table = prob_prefix_table
        if table.shape[0] % TILE_LANES:
            from .tiled import pad_tile

            table = pad_tile(table)
        tiled = table.reshape(-1, TILE_LANES)
        p_lo = start[:, None] + lo
        p_hi = start[:, None] + jnp.minimum(hi, d2 - 1)
        t0 = p_lo // TILE_LANES
        flat_t0 = t0.reshape(-1)
        pair = jnp.concatenate(
            [tiled[flat_t0], tiled[jnp.minimum(flat_t0 + 1, tiled.shape[0] - 1)]],
            axis=1,
        ).reshape(b, fanout, 2 * TILE_LANES)
        abspos = t0[:, :, None] * TILE_LANES + jnp.arange(
            2 * TILE_LANES, dtype=jnp.int32
        )
        inside = (abspos >= p_lo[:, :, None]) & (abspos <= p_hi[:, :, None])
        cnt = jnp.sum(
            inside & (pair <= u[:, :, None]), axis=-1, dtype=jnp.int32
        )
        lo = lo + cnt
    off = jnp.minimum(lo, safe_deg[:, None] - 1)
    nbr = take_1d(indices, start[:, None] + off)
    return _mask_rows(nbr, deg)
