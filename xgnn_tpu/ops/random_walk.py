"""Random-walk sampling with top-K frequency selection (PinSAGE path).

TPU-native re-expression of the reference's restart random walks +
``FrequencyHashmap`` per-node top-K
(``samgraph/common/cuda/cuda_sampling_random_walk.cu``,
``cuda/cuda_frequency_hashmap.{h,cu}``): walks are unrolled as W parallel
chains per seed with static length L; visit counting replaces the GPU hash
map with an in-row O(M^2) match-count (M = W*L is small and static), and
``lax.top_k`` picks the K most-visited distinct neighbors.  Visit counts are
emitted as edge weights, matching the reference's ``TrainGraph::data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from .tiled import take_1d

EMPTY = C.EMPTY_KEY


def _uniform_step(indptr, indices, cur, key):
    """One uniform neighbor step; nodes with no neighbors stay put as EMPTY."""
    valid = cur != EMPTY
    node = jnp.where(valid, cur, 0)
    start = take_1d(indptr, node)
    deg = jnp.where(valid, take_1d(indptr, node + 1) - start, 0)
    u = jax.random.uniform(key, cur.shape)
    off = jnp.minimum(
        jnp.floor(u * deg).astype(jnp.int32), jnp.maximum(deg - 1, 0)
    )
    nbr = take_1d(indices, start + off)
    return jnp.where(deg > 0, nbr, EMPTY)


def sample_random_walk(
    indptr,
    indices,
    frontier,
    fanout: int,
    key,
    *,
    num_random_walk: int,
    random_walk_length: int,
    restart_prob: float,
    tier=None,
):
    """Run restart random walks and keep each seed's top-``fanout`` most
    frequently visited distinct nodes.

    With ``tier = (num_cache_node, host_sampler, cold_cap)`` the device
    CSR holds only the hot node-id prefix and walkers standing on cold
    nodes take their step through the host callback (the out-of-core
    single-store mode; each step is a fanout-1 uniform draw, the same
    batched-exchange shape as ``_walk_step_partitioned``).

    Returns ``(neigh_ids, counts, overflow)``: ``(B, fanout)`` global
    neighbor ids (``EMPTY_KEY`` padded), their float32 visit counts (edge
    weights), and the cold-buffer overflow flag (always False untiered).
    """
    b = frontier.shape[0]
    w, l = num_random_walk, random_walk_length
    seed2d = jnp.broadcast_to(frontier[:, None], (b, w))
    cur = seed2d
    visits = []
    overflow = jnp.zeros((), jnp.bool_)
    for step in range(l):
        key, k_step, k_restart = jax.random.split(key, 3)
        # (step-0 seed-dedup via a fanout-w khop2 draw was A/B'd on chip and
        # measured NEGATIVE here: 9.42M vs 10.15M — the per-walker flat
        # gather beats the (b, w) pick composition on the single store.  The
        # partitioned walk keeps it: there it shrinks the owner EXCHANGE w×
        # and measured +12%, dist_topology.sample_random_walk_partitioned.)
        if step > 0:
            # teleport BEFORE the single step (not step-then-redo): each
            # walker takes exactly one uniform step from wherever the
            # restart left it — the same distribution as drawing a step and
            # replacing restarted draws, at HALF the indptr/indices gathers
            restart = jax.random.uniform(k_restart, (b, w)) < restart_prob
            cur = jnp.where(restart, seed2d, cur)
        if tier is None:
            nxt = _uniform_step(indptr, indices, cur, k_step)
        else:
            from ..parallel.ggms import cold_sample_callback

            num_cache_node, host_sampler, cold_cap = tier
            flat = cur.reshape(-1)
            hot = jnp.where(
                (flat != EMPTY) & (flat < num_cache_node), flat, EMPTY
            )
            nxt_hot = _uniform_step(indptr, indices, hot, k_step)
            cold_neigh, cold_mask, of = cold_sample_callback(
                host_sampler, flat, jax.random.key_data(k_step), 1,
                num_cache_node, cold_cap,
            )
            nxt = jnp.where(cold_mask, cold_neigh[:, 0], nxt_hot)
            nxt = nxt.reshape(cur.shape)
            overflow = overflow | of
        visits.append(nxt)
        cur = jnp.where(nxt == EMPTY, seed2d, nxt)  # stuck walks restart

    v = jnp.stack(visits, axis=2).reshape(b, w * l)  # (B, M)
    v = jnp.where(v == frontier[:, None], EMPTY, v)  # seed itself not a neighbor

    # in-row frequency count: M is small and static → O(M^2) match matrix
    eq = v[:, :, None] == v[:, None, :]  # (B, M, M)
    counts = jnp.sum(eq, axis=2).astype(jnp.int32)
    m = v.shape[1]
    tri = jnp.tril(jnp.ones((m, m), jnp.bool_), k=-1)
    seen_before = jnp.any(eq & tri[None, :, :], axis=2)
    is_first = (~seen_before) & (v != EMPTY)

    score = jnp.where(is_first, counts, -1)
    top_score, top_idx = jax.lax.top_k(score, fanout)
    neigh = jnp.take_along_axis(v, top_idx, axis=1)
    neigh = jnp.where(top_score > 0, neigh, EMPTY)
    weights = jnp.where(top_score > 0, top_score, 0).astype(jnp.float32)
    return neigh, weights, overflow
