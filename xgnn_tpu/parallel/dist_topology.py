"""Partitioned graph topology with remote sampling (the ``--use-dist-graph``
GGMS path).

The reference partitions the hot node-id prefix of the CSR by interleaved
node id across GPU memories and lets sampling kernels dereference rows
element-by-element over NVLink, falling through to the pinned host
whole-graph for nodes beyond the prefix (``DeviceDistGraph``,
``cuda/dist_graph.h:114-158``; partitioning ``dist_graph.cu:228-272``;
prefix sizing ``dist_engine.cc:224-235``).  The TPU re-design goes further
than batching the *reads*: it ships the *sampling* to the owner —

    sort frontier by owner → all_to_all the (node, seed) requests →
    the owner draws K neighbors per request from its local CSR rows →
    all_to_all the fixed-size (K,) results back,

and cold (host-tier) nodes are served by a batched host callback
(``ggms.cold_sample_callback``) instead of per-element zero-copy reads.

This bounds remote traffic at O(frontier × K) ids regardless of degree —
strictly less than shipping adjacency lists, and each chip's draw uses plain
local-CSR kernels.  Per-request RNG keys are derived from (step key, node id)
so results are independent of which chip issued the request.

All 8 sampling algorithms dispatch over this partitioned store, matching the
reference's templated kernel dispatch (``dist/dist_loops.cc:148-255``):
khop0-3 and the weighted family run owner-side (weighted tables are
partitioned edge-aligned with the local CSR; alias entries are global node
ids so no remap is needed), and random walks are unrolled as per-step
exchanges (each walk step is a fanout-1 owner draw).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import SampleType
from ..ops import sampling
from .exchange import plan_exchange

EMPTY = C.EMPTY_KEY

WEIGHTED_TYPES = (
    SampleType.WEIGHTED_KHOP,
    SampleType.WEIGHTED_KHOP_PREFIX,
    SampleType.WEIGHTED_KHOP_HASH_DEDUP,
)


class LocalTopo(NamedTuple):
    """One chip's partition of the hot topology prefix (+ weighted tables,
    edge-aligned with ``indices``).  A pytree of stacked ``(P, ...)`` arrays
    host-side; inside shard_map each chip sees its own slice."""

    indptr: jax.Array
    indices: jax.Array
    prob: Optional[jax.Array] = None
    alias: Optional[jax.Array] = None
    prefix: Optional[jax.Array] = None
    # tile-granular CDF index over the LOCAL rows (ops.sampling
    # build_coarse_cdf semantics) — built whenever ``prefix`` is present
    coarse: Optional[jax.Array] = None


def partition_csr_host(
    indptr: np.ndarray,
    indices: np.ndarray,
    num_parts: int,
    num_cache_node: Optional[int] = None,
    prob: Optional[np.ndarray] = None,
    alias: Optional[np.ndarray] = None,
    prefix: Optional[np.ndarray] = None,
) -> LocalTopo:
    """Interleave-partition the hot CSR prefix on the host: part p owns rows
    p, p+P, ... of ``[0, num_cache_node)``.

    Returns a :class:`LocalTopo` of stacked ``(P, rows+1)`` / ``(P,
    max_edges)`` arrays ready for ``put_sharded``.  Row ``v`` is local row
    ``v // P`` of part ``v % P``.  Weighted tables are sliced edge-aligned;
    alias entries are global node ids (reference binary format) so they need
    no translation.
    """
    from ..ops.tiled import TILE

    num_node = len(indptr) - 1
    if num_cache_node is None:
        num_cache_node = num_node
    rows = max(-(-num_cache_node // num_parts), 1)
    iptr_len = -(-(rows + 1) // TILE) * TILE
    local_iptr = np.zeros((num_parts, iptr_len), np.int32)
    locals_idx = []
    locals_payload = [[] for _ in range(3)]
    payloads = [p for p in (prob, alias, prefix)]
    max_edges = 0
    for p in range(num_parts):
        own = np.arange(p, num_cache_node, num_parts)
        # int64 arithmetic: the INPUT indptr may be uint32/int64 with
        # offsets >= 2^31 (big-graph loader path, dataset.py); the OUTPUT is
        # rebased per-part offsets that must fit int32 for the device
        degs = indptr[own + 1].astype(np.int64) - indptr[own].astype(np.int64)
        li = np.zeros(iptr_len, np.int64)
        li[1 : len(own) + 1] = np.cumsum(degs)
        li[len(own) + 1 :] = li[len(own)] if len(own) else 0
        part_edges = int(li[len(own)]) if len(own) else 0
        if part_edges >= 2**31:
            # refuse BEFORE materializing anything: device-side topology
            # arrays are int32 by design (TPU-native — JAX x64 off).  At
            # P >= 2 every reference dataset's per-part share fits; at P=1
            # the engine serves >= 2^31-edge graphs through the int64 host
            # tier by clamping num_cache_node (clamp_num_cache_node_int32).
            raise ValueError(
                f"partition {p} would own {part_edges} edges (>= 2^31): "
                "increase num_parts or lower num_cache_node (host tier "
                "serves the remainder via int64 offsets)"
            )
        slices = [slice(int(indptr[v]), int(indptr[v + 1])) for v in own]
        le = (
            np.concatenate([indices[s] for s in slices])
            if slices
            else np.empty(0, indices.dtype)
        )
        for j, pay in enumerate(payloads):
            if pay is not None:
                locals_payload[j].append(
                    np.concatenate([pay[s] for s in slices])
                    if slices
                    else np.empty(0, pay.dtype)
                )
        local_iptr[p] = li.astype(np.int32)
        locals_idx.append(le)
        max_edges = max(max_edges, len(le))
    max_edges = -(-max(max_edges, 1) // TILE) * TILE
    local_idx = np.zeros((num_parts, max_edges), np.int32)
    out_payloads = []
    for j, pay in enumerate(payloads):
        out_payloads.append(
            np.zeros((num_parts, max_edges), pay.dtype)
            if pay is not None
            else None
        )
    for p, le in enumerate(locals_idx):
        local_idx[p, : len(le)] = le
        for j, pay in enumerate(payloads):
            if pay is not None:
                out_payloads[j][p, : len(locals_payload[j][p])] = (
                    locals_payload[j][p]
                )
    coarse = None
    if prefix is not None:
        # per-part tile-granular CDF index over the local rows — the same
        # ~3-tile-touch prefix search the single store gets from
        # Graph.coarse_cdf (ops.sampling.build_coarse_cdf), built host-side
        from ..ops.sampling import _coarse_pos
        from ..ops.tiled import TILE as LANES

        coarse = np.zeros((num_parts, rows, LANES), np.float32)
        jj = np.arange(LANES, dtype=np.int64)[None, :]
        for p in range(num_parts):
            ip = local_iptr[p].astype(np.int64)
            d = ip[1 : rows + 1] - ip[:rows]
            e = _coarse_pos(jj, np.maximum(d, 1)[:, None], LANES)
            pos = ip[:rows, None] + np.clip(
                e, 0, np.maximum(d - 1, 0)[:, None]
            )
            c = out_payloads[2][p][pos].astype(np.float32)
            c[d == 0] = 0.0
            coarse[p] = c
    return LocalTopo(local_iptr, local_idx, *out_payloads, coarse)


def _owner_sample(topo: LocalTopo, req_ids, fanout, key, sample_type,
                  max_deg=None):
    """Draw K neighbors for each requested global id from local CSR rows.

    ``req_ids``: (P, S) global node ids owned by this chip (EMPTY padded).
    Per-request keys derive from (key, node id, request slot): the slot term
    decorrelates DUPLICATE requests for the same node — without it, every
    random-walk lane parked at the same node would draw the identical next
    hop (lane collapse; ``ops.random_walk`` draws per-lane for the same
    reason).
    """
    num_parts = req_ids.shape[0]
    flat = req_ids.reshape(-1)
    local_rows = jnp.where(flat != EMPTY, flat // num_parts, EMPTY)
    data = jax.random.key_data(key).astype(jnp.uint32)
    # cheap per-request key derivation: xor-fold node id + slot into the key
    slot_mix = (
        jnp.arange(flat.shape[0], dtype=jnp.uint32) * jnp.uint32(0x85EBCA6B)
    )
    mixed = data[None, :] ^ (
        jnp.where(flat != EMPTY, flat, 0).astype(jnp.uint32)
        * jnp.uint32(0x9E3779B9)
        ^ slot_mix
    )[:, None]

    st = SampleType
    hash_dedup = sample_type == st.WEIGHTED_KHOP_HASH_DEDUP
    # per-request uniforms in ONE vmapped threefry pass (elementwise u32
    # rounds — fuses fully); the sampler then runs BATCHED over the whole
    # flat request vector.  Round 2 vmapped the entire kernel per request
    # ((1,)-frontier inner calls) which serialized the gathers and left the
    # VPU idle — this keeps only the RNG per-request, as required for
    # chip-independent draws, and the gathers stay wide.
    if hash_dedup:
        n_draw = 2 * sampling.HASH_DEDUP_ROUNDS  # rounds*K slots + coins
    elif sample_type == st.WEIGHTED_KHOP:
        n_draw = 2
    else:
        n_draw = 1
    draw = jax.vmap(
        lambda kd: jax.random.uniform(
            jax.random.wrap_key_data(kd), (n_draw, fanout)
        )
    )
    uu = draw(mixed)  # (P*S, n_draw, K)
    u = uu[:, 0]
    if sample_type == C.UNIFORM_WR:
        out = sampling.sample_uniform_wr(
            topo.indptr, topo.indices, local_rows, fanout, u=u
        )
    elif sample_type == st.KHOP0:
        out = sampling.sample_khop0(
            topo.indptr, topo.indices, local_rows, fanout, u=u
        )
    elif sample_type == st.KHOP1:
        out = sampling.sample_khop1(
            topo.indptr, topo.indices, local_rows, fanout, u=u
        )
    elif sample_type == st.KHOP2:
        out = sampling.sample_khop2(
            topo.indptr, topo.indices, local_rows, fanout, u=u
        )
    elif sample_type == st.KHOP3:
        out = sampling.sample_khop3(
            topo.indptr, topo.indices, local_rows, fanout, u=u
        )
    elif sample_type == st.WEIGHTED_KHOP:
        out = sampling.sample_weighted_khop(
            topo.indptr, topo.indices, topo.prob, topo.alias,
            local_rows, fanout, u=u, coin=uu[:, 1],
        )
    elif hash_dedup:
        r = sampling.HASH_DEDUP_ROUNDS
        n = uu.shape[0]
        out = sampling.sample_weighted_khop_hash_dedup(
            topo.indptr, topo.indices, topo.prob, topo.alias,
            local_rows, fanout,
            u=uu[:, :r].reshape(n, r * fanout),
            coin=uu[:, r:].reshape(n, r * fanout),
        )
    elif sample_type == st.WEIGHTED_KHOP_PREFIX:
        out = sampling.sample_weighted_khop_prefix(
            topo.indptr, topo.indices, topo.prefix, local_rows, fanout,
            max_deg=max_deg, coarse_cdf=topo.coarse, u=u,
        )
    else:
        raise NotImplementedError(sample_type)
    return out.reshape(num_parts, req_ids.shape[1], fanout)


def sample_layer_partitioned(
    topo: LocalTopo,
    frontier: jax.Array,
    fanout: int,
    key: jax.Array,
    axis_name: str,
    seg_cap: int,
    sample_type: SampleType = SampleType.KHOP3,
    *,
    num_cache_node: Optional[int] = None,
    host_sampler=None,
    cold_cap: int = 0,
    max_deg: Optional[int] = None,
):
    """One sampling layer over the partitioned topology (inside shard_map).

    With a host tier (``num_cache_node`` set), frontier nodes at or beyond
    the prefix are served by the host callback — the reference's partition
    slot ``num_partition`` (dist_graph.h:141-151).

    Returns ``(neigh (cap, K) global ids, overflow)``.
    """
    num_parts = jax.lax.axis_size(axis_name)
    # per-peer ranks are prefix counts over the frontier: a segment can
    # never need more slots than the frontier has entries (kills the
    # headroom padding at P=1 and any layer whose frontier is smaller
    # than its derived segment)
    seg_cap = min(seg_cap, frontier.shape[0])
    has_cold = num_cache_node is not None and host_sampler is not None
    if has_cold:
        valid = frontier != EMPTY
        hot_frontier = jnp.where(
            valid & (frontier < num_cache_node), frontier, EMPTY
        )
    else:
        hot_frontier = frontier
    send, owner, rank, overflow = plan_exchange(
        hot_frontier, num_parts, seg_cap
    )
    req = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
    req = req.reshape(num_parts, seg_cap)
    drawn = _owner_sample(topo, req, fanout, key, sample_type, max_deg)
    resp = jax.lax.all_to_all(drawn, axis_name, 0, 0, tiled=True)
    resp = resp.reshape(num_parts, seg_cap, fanout)
    ok = (owner < num_parts) & (rank < seg_cap)
    # invalid picks spread over DISTINCT response rows (clamping them all
    # to one slot serializes its transactions — collision_bench.tsv); the
    # picked garbage is masked to EMPTY below
    spread = jnp.arange(owner.shape[0], dtype=jnp.int32) % (
        num_parts * seg_cap
    )
    picked = jnp.take(  # (cap, K), request order; 1-D linearized pick
        resp.reshape(num_parts * seg_cap, fanout),
        jnp.where(ok, owner * seg_cap + rank, spread),
        axis=0,
    )
    neigh = jnp.where(ok[:, None], picked, EMPTY)
    if has_cold:
        from .ggms import cold_sample_callback

        cold_neigh, cold_mask, cold_of = cold_sample_callback(
            host_sampler, frontier, jax.random.key_data(key), fanout,
            num_cache_node, cold_cap,
        )
        neigh = jnp.where(cold_mask[:, None], cold_neigh, neigh)
        overflow = overflow | cold_of
    return neigh, overflow


def _walk_step_partitioned(
    topo, cur, key, axis_name, seg_cap, num_cache_node, host_sampler, cold_cap
):
    """One uniform walk step over the partitioned store: fanout-1 owner draw
    (the per-element remote reads of cuda_sampling_random_walk.cu batched
    into an exchange)."""
    nbr, of = sample_layer_partitioned(
        topo, cur, 1, key, axis_name, seg_cap, C.UNIFORM_WR,
        num_cache_node=num_cache_node, host_sampler=host_sampler,
        cold_cap=cold_cap,
    )
    return nbr[:, 0], of


def sample_random_walk_partitioned(
    topo: LocalTopo,
    frontier: jax.Array,
    fanout: int,
    key: jax.Array,
    axis_name: str,
    seg_cap: int,
    *,
    num_random_walk: int,
    random_walk_length: int,
    restart_prob: float,
    num_cache_node: Optional[int] = None,
    host_sampler=None,
    cold_cap: int = 0,
    max_deg: Optional[int] = None,  # accepted for tier-kwargs parity (walk
):  # steps are uniform draws — no prefix search)
    """Restart random walks + per-seed top-K frequency over the partitioned
    topology (reference dispatches ``GPUSampleRandomWalk`` over
    ``DeviceDistGraph``; here each walk step is an owner-side exchange).

    Mirrors ``ops.random_walk.sample_random_walk``'s frequency/top-K logic.
    """
    b = frontier.shape[0]
    w, l = num_random_walk, random_walk_length
    seed2d = jnp.broadcast_to(frontier[:, None], (b, w))
    cur = seed2d
    visits = []
    overflow = jnp.zeros((), jnp.bool_)
    walk_seg_cap = seg_cap * w
    walk_cold_cap = cold_cap * w if cold_cap else 0

    def step_fn(cur2d, k):
        flat, of = _walk_step_partitioned(
            topo, cur2d.reshape(-1), k, axis_name, walk_seg_cap,
            num_cache_node, host_sampler, walk_cold_cap,
        )
        return flat.reshape(b, w), of

    for step in range(l):
        key, k_step, k_restart = jax.random.split(key, 3)
        if step == 0:
            # every walker stands on its seed: ONE fanout-w with-replacement
            # exchange over the b seeds replaces an exchange of b*w
            # duplicated rows — identical distribution (owner draws are
            # independent per (request, slot)), a w-times smaller
            # plan/request matrix, and no w-fold duplicate gather indices on
            # the owner side (repeated indices COLLIDE on this chip,
            # collision_bench.tsv)
            nxt, of = sample_layer_partitioned(
                topo, frontier, w, k_step, axis_name, seg_cap,
                C.UNIFORM_WR, num_cache_node=num_cache_node,
                host_sampler=host_sampler, cold_cap=cold_cap,
            )
            overflow = overflow | of
            visits.append(nxt)
            cur = jnp.where(nxt == EMPTY, seed2d, nxt)
            continue
        # teleport BEFORE the single step (same distribution as
        # step-then-redo; ops/random_walk.py) — here it also saves a
        # whole owner EXCHANGE (two all_to_alls) per walk step
        restart = jax.random.uniform(k_restart, (b, w)) < restart_prob
        cur = jnp.where(restart, seed2d, cur)
        nxt, of = step_fn(cur, k_step)
        overflow = overflow | of
        visits.append(nxt)
        cur = jnp.where(nxt == EMPTY, seed2d, nxt)

    v = jnp.stack(visits, axis=2).reshape(b, w * l)
    v = jnp.where(v == frontier[:, None], EMPTY, v)
    eq = v[:, :, None] == v[:, None, :]
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


def sample_minibatch_partitioned(
    topo: LocalTopo,
    seeds: jax.Array,
    num_seed: jax.Array,
    key: jax.Array,
    *,
    axis_name: str,
    seg_cap: int,
    sample_type: SampleType,
    fanouts: Sequence[int],
    capacities: Sequence[int],
    rw_params: tuple = (4, 3, 0.5),
    num_cache_node: Optional[int] = None,
    host_sampler=None,
    cold_cap: int = 0,
    max_deg: Optional[int] = None,
):
    """Multi-layer sampling over the partitioned topology (inside shard_map).

    Mirrors ``sampler._sample_minibatch`` but each layer's neighbor draw goes
    through the owner-side exchange (+ host cold tier).  Frontier dedup/remap
    stays chip-local.
    """
    from ..ops import unique
    from ..types import Block, SampledBatch

    frontier = seeds
    num_frontier = num_seed
    blocks = []
    overflow = jnp.zeros((), jnp.bool_)
    tier = dict(
        num_cache_node=num_cache_node, host_sampler=host_sampler,
        cold_cap=cold_cap, max_deg=max_deg,
    )
    for layer, fanout in enumerate(fanouts):
        # per-LAYER exchange segment: the engine's seg_cap is sized to the
        # LAST (largest) frontier; early layers request at most caps[layer]
        # ids, so their send matrices and owner-side pick gathers scale
        # down proportionally (a global seg_cap made layer 0 process
        # 2*caps[-1]*K picks — a 37 GB gather intermediate at bench shapes)
        layer_seg = max(
            int(np.ceil(seg_cap * capacities[layer] / capacities[-1])), 128
        )
        key, k_layer = jax.random.split(key)
        weights = None
        if sample_type == SampleType.RANDOM_WALK:
            num_rw, rw_len, restart = rw_params
            nbr, weights, of = sample_random_walk_partitioned(
                topo, frontier, fanout, k_layer, axis_name, layer_seg,
                num_random_walk=num_rw, random_walk_length=rw_len,
                restart_prob=restart, **tier,
            )
        else:
            nbr, of = sample_layer_partitioned(
                topo, frontier, fanout, k_layer, axis_name, layer_seg,
                sample_type, **tier,
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
                weights=weights,
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
