"""The composed GGMS: partial partitioned HBM cache + host-RAM cold tier.

This is the full re-expression of the reference's Global GNN Memory Store —
the composition round 1 lacked.  The reference keeps a hot subset of features
and topology spread over all GPU memories and serves everything else from
pinned host memory, transparently inside kernels:

- feature side: the top ``cache_percentage`` ranked nodes get cache positions
  ``0..K-1`` (node→position hashtable ``_sampler_gpu_hashtable``); position
  ``p`` lives on GPU ``p % P`` (``cuda_cache_manager_host.cc:133-244``,
  ``DeviceDistFeature``, ``dist_graph.h:182-212``); misses are gathered from
  pinned host feat (``GPUExtractMissData``,
  ``cuda_cache_manager_device.cu:573-625``) and combined
  (``combine_cache_data_for_partition`` :277-299).
- topology side: the node-id prefix ``[0, num_cache_node)`` — sized so its
  edges fit ``dist_graph_percentage * num_edge`` (``dist_engine.cc:224-235``)
  — is interleave-partitioned across device memories; every other node's
  adjacency is read from the pinned host whole-graph at partition slot
  ``num_partition`` (``DeviceDistGraph::_GetRealPartId``,
  ``dist_graph.h:141-151``).

TPUs cannot issue per-element host/remote reads from inside a program, so
each mechanism becomes a *batched* path with static shapes:

- cache hits ride the sorted all-to-all exchange over cache positions
  (``exchange.partitioned_gather``); misses are compacted into a fixed-size
  id buffer that exits the program, the host gathers rows from the host-RAM
  feature matrix (OMP ``clib.gather_rows``), and a second program scatters
  them back in (two-phase step = the pipelining seam).
- cold topology reads become a host callback (``jax.pure_callback``) serving
  neighbor draws straight from the host CSR — the "host memory whole graph"
  partition, entered per layer with a bounded ``cold_cap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import SampleType
from .exchange import partitioned_gather

EMPTY = C.EMPTY_KEY


_HOST_CB = None


def host_callbacks_supported() -> bool:
    """Whether this runtime executes ``jax.pure_callback`` (host send/recv).

    Standard CPU/GPU/TPU runtimes do; this environment's axon TUNNEL plugin
    does not (UNIMPLEMENTED) — which gates the cold-TOPOLOGY tier (a
    per-layer batched callback).  The feature-miss tier is unaffected: it
    exits the program between the two-phase steps.  Probed once per
    process with a scalar round-trip.
    """
    global _HOST_CB
    if _HOST_CB is None:
        try:
            fn = jax.jit(
                lambda x: jax.pure_callback(
                    lambda y: y,
                    jax.ShapeDtypeStruct((), jnp.int32), x,
                )
            )
            np.asarray(fn(jnp.int32(3)))
            _HOST_CB = True
        except Exception:
            _HOST_CB = False
    return _HOST_CB


def compute_num_cache_node(indptr: np.ndarray, percentage: float) -> int:
    """Size the device-resident topology prefix so its edges consume
    ``percentage`` of all edges (reference dist_engine.cc:224-235)."""
    num_node = len(indptr) - 1
    if percentage >= 1.0:
        return num_node
    num_cache_edge = int(int(indptr[-1]) * percentage)
    return int(
        min(np.searchsorted(indptr, num_cache_edge, side="left"), num_node)
    )


INT32_EDGE_LIMIT = 2**31 - 1  # device-side edge offsets must fit int32


def clamp_num_cache_node_int32(
    indptr: np.ndarray, num_cache_node: int, num_parts: int = 1
) -> int:
    """Largest prefix ``<= num_cache_node`` whose interleaved per-part edge
    share fits int32 device offsets.

    Device topology arrays are int32 by TPU-first design (JAX x64 off;
    ``partition_csr_host`` REBASES per-part offsets so each part only needs
    to address its own edges).  For ``>= 2^31``-edge graphs at small P the
    hot prefix is clamped here and the remainder is served by the int64
    host tier (``HostColdSampler`` computes offsets in int64 — the
    reference's pinned-host whole-graph partition slot, dist_graph.h:141-151,
    whose uint32 offsets cover the full 4.29B-edge id space)."""
    num_cache_node = int(num_cache_node)
    if int(indptr[num_cache_node]) <= INT32_EDGE_LIMIT:
        return num_cache_node  # whole prefix fits → every part fits
    deg = (
        indptr[1 : num_cache_node + 1].astype(np.int64)
        - indptr[:num_cache_node].astype(np.int64)
    )
    cums = [np.cumsum(deg[p::num_parts]) for p in range(num_parts)]

    def fits(ncn: int) -> bool:
        for p in range(num_parts):
            k = max(0, -(-(ncn - p) // num_parts))  # own rows p, p+P, ... < ncn
            if k > 0 and int(cums[p][k - 1]) > INT32_EDGE_LIMIT:
                return False
        return True

    lo, hi = 0, num_cache_node
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


# --------------------------------------------------------------------------
# feature cache: hit/miss split (inside shard_map) + host-row combine
# --------------------------------------------------------------------------

def cache_split(
    posmap: jax.Array,
    cache_local: jax.Array,
    ids: jax.Array,
    axis_name: str,
    seg_cap: int,
    miss_cap: int,
    partitioned: bool = True,
):
    """Split requested node ids into cache hits (served now) and misses
    (compacted for the host).  Runs inside ``shard_map``.

    The reference's ``GetMissCacheIndex`` count/scan/compact kernel pipeline
    (``cuda_cache_manager_device.cu:41-170``) as one argsort compaction, plus
    the partition-cache combine: hit positions are gathered through the
    owner-chip exchange (replacing per-element NVLink reads of
    ``combine_cache_data_for_partition``).

    Args:
      posmap: ``(num_node,)`` replicated node→cache-position table
        (``EMPTY`` = not cached) — the sampler-side cache hashtable.
      cache_local: ``(cache_rows_per_part, F)`` this chip's cache partition
        (position ``p`` lives on chip ``p % P`` at row ``p // P``).  With
        ``partitioned=False``: the full replicated cache (SGNN mode).
      ids: ``(cap,)`` requested global node ids, EMPTY-padded.
      miss_cap: static miss-buffer size; more misses than this → overflow.

    Returns:
      ``(hit_rows, miss_ids, miss_pos, num_miss, num_hit, overflow)``:
      hit rows ``(cap, F)`` (zeros at miss slots), the compacted miss ids and
      their positions ``(miss_cap,)``, hit/miss counts, overflow flag.
    """
    from ..ops.tiled import take_1d

    cap = ids.shape[0]
    miss_cap = min(miss_cap, cap)
    valid = ids != EMPTY
    # padding lookups spread over distinct nodes/rows — parking them on
    # entry 0 serializes that tile's transactions (collision_bench.tsv)
    spread = (
        jnp.arange(cap, dtype=jnp.int32) * jnp.int32(127)
    ) % jnp.int32(max(posmap.shape[0], 1))
    safe = jnp.where(valid, ids, spread)
    slots = take_1d(posmap, safe)
    hit = valid & (slots != EMPTY)
    if partitioned:
        pos_req = jnp.where(hit, slots, EMPTY)
        hit_rows, of = partitioned_gather(
            cache_local, pos_req, axis_name, seg_cap
        )
    else:
        row_spread = (
            jnp.arange(cap, dtype=jnp.int32) * jnp.int32(127)
        ) % jnp.int32(max(cache_local.shape[0], 1))
        hit_rows = jnp.take(
            cache_local, jnp.where(hit, slots, row_spread), axis=0,
            mode="clip",
        )
        hit_rows = hit_rows * hit[:, None].astype(hit_rows.dtype)
        of = jnp.zeros((), jnp.bool_)
    miss = valid & ~hit
    num_miss = jnp.sum(miss).astype(jnp.int32)
    num_hit = jnp.sum(hit).astype(jnp.int32)
    from ..ops.unique import compact_mask_positions

    miss_pos = compact_mask_positions(miss, miss_cap)
    in_range = jnp.arange(miss_cap) < num_miss
    miss_ids = jnp.where(in_range, ids[miss_pos], EMPTY)
    overflow = of | (num_miss > miss_cap)
    return hit_rows, miss_ids, miss_pos, num_miss, num_hit, overflow


def combine_miss(hit_rows, miss_rows, miss_pos, num_miss):
    """Scatter host-gathered miss rows into their request slots
    (``CombineMissData``, cuda_cache_manager_device.cu:627-731)."""
    bucket = miss_rows.shape[0]
    n = hit_rows.shape[0]
    tgt = jnp.where(jnp.arange(bucket) < num_miss, miss_pos, n)
    return hit_rows.at[tgt].set(
        miss_rows.astype(hit_rows.dtype), mode="drop"
    )


def build_cache(
    feat_host: np.ndarray,
    ranking: np.ndarray,
    cache_percentage: float,
    num_parts: int,
):
    """Host-side cache construction (the part-cache ctor,
    cuda_cache_manager_host.cc:133-244).

    Returns ``(posmap, cache_parts, num_cache)``: the node→position table
    ``(num_node,)``, the interleave-partitioned cache rows
    ``(P, rows_per_part, F)`` ready for ``put_sharded``, and the cache size.
    Rank order maps straight to positions: ``pos % P`` spreads the hottest
    nodes round-robin across chips, so the load balance the reference gets by
    shuffling its ranked prefix falls out of the mapping itself.
    """
    from .exchange import shard_interleaved
    from .. import clib

    num_node = feat_host.shape[0]
    num_cache = int(num_node * min(max(cache_percentage, 0.0), 1.0))
    posmap = np.full(num_node, EMPTY, np.int32)
    cache_ids = np.asarray(ranking[:num_cache], dtype=np.int64)
    posmap[cache_ids] = np.arange(num_cache, dtype=np.int32)
    if num_cache:
        rows = clib.gather_rows(feat_host, cache_ids)
    else:
        rows = np.zeros((num_parts, feat_host.shape[1]), feat_host.dtype)
    return posmap, shard_interleaved(rows, num_parts), num_cache


# --------------------------------------------------------------------------
# topology cold tier: host CSR sampling callback
# --------------------------------------------------------------------------

def _hash_u01(x: np.ndarray, salt: np.ndarray | int) -> np.ndarray:
    """Vectorized counter-based uniform draws in [0, 1) (xmur-style mixer):
    deterministic in (salt, x), chip- and call-site-independent."""
    h = (x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(salt)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return (h >> np.uint64(11)).astype(np.float64) * (2.0**-53)


class HostColdSampler:
    """Per-layer host neighbor draws for nodes outside the device-resident
    topology prefix — the "host whole graph at partition slot P" of the
    reference (``dist_graph.h:141-151``), entered as a batched
    ``pure_callback`` instead of per-element zero-copy reads.

    Draw semantics mirror ``ops.sampling`` per algorithm; determinism comes
    from counter-based hashing of (step key, node id, request position,
    pick slot) — the position term keeps duplicate requests for the same
    node (random-walk lanes) independent, matching the device path's
    per-request key derivation.
    """

    def __init__(
        self,
        indptr: np.ndarray,
        indices: np.ndarray,
        sample_type: SampleType,
        prob_table: np.ndarray | None = None,
        alias_table: np.ndarray | None = None,
        prob_prefix_table: np.ndarray | None = None,
    ):
        self.indptr = np.asarray(indptr)
        self.indices = np.asarray(indices)
        self.sample_type = sample_type
        self.prob_table = prob_table
        self.alias_table = alias_table
        self.prob_prefix_table = prob_prefix_table
        self.num_node = len(self.indptr) - 1

    def __call__(self, ids: np.ndarray, keydata: np.ndarray, fanout: int):
        """ids: (n,) int32 global node ids (EMPTY padded) → (n, fanout) int32
        neighbor ids (EMPTY padded)."""
        ids = np.asarray(ids)
        n = len(ids)
        k = fanout
        out = np.full((n, k), EMPTY, np.int32)
        valid = (ids != EMPTY) & (ids >= 0) & (ids < self.num_node)
        if not valid.any():
            return out
        if len(self.indices) == 0:
            return out
        v = ids[valid].astype(np.int64)
        start = self.indptr[v].astype(np.int64)
        deg = self.indptr[v + 1].astype(np.int64) - start
        # zero-degree nodes at the CSR tail have start == num_edge; their
        # reads are masked to EMPTY below, but the gathers themselves must
        # stay in bounds (indices/prob/alias/prefix are edge-aligned)
        start = np.minimum(start, len(self.indices) - 1)
        kd = np.asarray(keydata).astype(np.uint64).ravel()
        salt = 0  # FNV-style fold of the key words (python ints: no overflow)
        for w in kd:
            salt = ((salt * 0x100000001B3) ^ int(w)) & 0xFFFFFFFFFFFFFFFF
        salt = np.uint64(salt)
        # per-row salt folds the REQUEST POSITION in: duplicate requests for
        # the same node (random-walk lanes) must draw independently — keying
        # on node id alone would collapse all lanes onto one walk
        pos = np.nonzero(valid)[0].astype(np.uint64)
        with np.errstate(over="ignore"):
            row_salt = salt ^ (pos * np.uint64(0xD6E8FEB86659FD93))
        salt = row_salt[:, None]
        slot_ctr = v[:, None] * np.int64(k) + np.arange(k, dtype=np.int64)
        u = _hash_u01(slot_ctr, salt)
        st = SampleType
        if self.sample_type in (st.KHOP0, st.KHOP2, st.KHOP3):
            # all three reference kernels are uniform WITHOUT replacement
            # (ops/sampling.py module docstring)
            nbr = self._khop0(start, deg, u)
        elif self.sample_type == st.WEIGHTED_KHOP:
            slot = np.minimum(
                (u * deg[:, None]).astype(np.int64),
                np.maximum(deg - 1, 0)[:, None],
            )
            edge = start[:, None] + slot
            coin = _hash_u01(slot_ctr, salt ^ np.uint64(0xC01))
            take_alias = coin >= self.prob_table[edge]
            nbr = np.where(
                take_alias, self.alias_table[edge], self.indices[edge]
            ).astype(np.int64)
        elif self.sample_type == st.WEIGHTED_KHOP_HASH_DEDUP:
            nbr = self._weighted_wor(start, deg, v, salt, k)
        elif self.sample_type == st.WEIGHTED_KHOP_PREFIX:
            nbr = self._prefix(start, deg, u)
        else:  # khop1 / random-walk steps: uniform WITH replacement
            off = np.minimum(
                (u * deg[:, None]).astype(np.int64),
                np.maximum(deg - 1, 0)[:, None],
            )
            nbr = self.indices[start[:, None] + off].astype(np.int64)
            if self.sample_type == st.KHOP1:
                nbr = self._dedup_rows(nbr)
        nbr = np.where(deg[:, None] > 0, nbr, EMPTY)
        out[valid] = nbr.astype(np.int32)
        return out

    def _khop0(self, start, deg, u):
        """Vectorized partial Fisher-Yates, mirroring
        ops.sampling.sample_khop0 (exact without replacement)."""
        n, k = u.shape
        rec_pos, rec_val = [], []
        picks = np.zeros((n, k), np.int64)

        def lookup(x):
            y = x.copy()
            for p, w in zip(rec_pos, rec_val):
                m = x == p
                y[m] = w[m]
            return y

        for j in range(k):
            span = np.maximum(deg - j, 1)
            t = j + np.minimum((u[:, j] * span).astype(np.int64), span - 1)
            pick = lookup(t)
            a_j = lookup(np.full(n, j, np.int64))
            rec_pos.append(t)
            rec_val.append(a_j)
            picks[:, j] = np.where(j < deg, pick, 0)
        nbr = self.indices[
            start[:, None] + picks
        ].astype(np.int64)
        return np.where(np.arange(k)[None, :] < deg[:, None], nbr, EMPTY)

    def _prefix(self, start, deg, u):
        """Vectorized per-segment ``searchsorted(side='right')``: one
        broadcast binary search over all (row, pick) cells — O(n·k·log d)
        with no Python loop over requests (the cold buffer doubles on
        overflow, so a per-row loop would go quadratic)."""
        n, k = u.shape
        safe_deg = np.maximum(deg, 1)
        total = self.prob_prefix_table[start + safe_deg - 1]
        target = u * total[:, None]
        lo = np.zeros((n, k), np.int64)
        hi = np.broadcast_to(safe_deg[:, None], (n, k)).copy()
        table, base = self.prob_prefix_table, start[:, None]
        last = len(table) - 1  # mid==hi==deg reads are masked, but must stay in bounds
        for _ in range(int(np.log2(max(int(safe_deg.max()), 1)) + 2)):
            mid = (lo + hi) >> 1
            go_right = (table[np.minimum(base + mid, last)] <= target) & (mid < hi)
            lo = np.where(go_right, mid + 1, lo)
            hi = np.where(go_right, hi, mid)
        off = np.minimum(lo, safe_deg[:, None] - 1)
        return np.where(
            deg[:, None] > 0, self.indices[base + off].astype(np.int64), EMPTY
        )

    def _weighted_wor(self, start, deg, v, salt, k):
        """First-K-distinct over bounded alias draws, mirroring
        ops.sampling.sample_weighted_khop_hash_dedup (reference
        cuda_sampling_weighted_khop_hash_dedup.cu draw-until-K-distinct;
        full row when deg <= K)."""
        from ..ops.sampling import HASH_DEDUP_ROUNDS

        m = HASH_DEDUP_ROUNDS * k
        n = len(v)
        ctr = v[:, None] * np.int64(m) + np.arange(m, dtype=np.int64)
        u = _hash_u01(ctr, salt)
        coin = _hash_u01(ctr, salt ^ np.uint64(0xC01))
        slot = np.minimum(
            (u * deg[:, None]).astype(np.int64),
            np.maximum(deg - 1, 0)[:, None],
        )
        edge = start[:, None] + slot
        take_alias = coin >= self.prob_table[edge]
        val = np.where(
            take_alias, self.alias_table[edge], self.indices[edge]
        ).astype(np.int64)
        # stable (value, slot) sort via packed keys → group leaders carry
        # their first draw slot → re-sort by first slot = draw order
        idx = np.arange(m, dtype=np.int64)[None, :]
        pack = np.sort(val * m + idx, axis=1)
        val_s, idx_s = pack // m, pack % m
        lead = np.concatenate(
            [np.ones((n, 1), bool), val_s[:, 1:] != val_s[:, :-1]], axis=1
        )
        first_slot = np.where(lead, idx_s, m)
        pack2 = np.sort(first_slot * (2**31) + val_s, axis=1)[:, :k]
        picked = np.where(pack2 // (2**31) < m, pack2 % (2**31), EMPTY)
        j = np.arange(k, dtype=np.int64)[None, :]
        full_off = np.minimum(j, np.maximum(deg - 1, 0)[:, None])
        full = self.indices[start[:, None] + full_off].astype(np.int64)
        full = np.where(j < deg[:, None], full, EMPTY)
        return np.where((deg <= k)[:, None], full, picked)

    @staticmethod
    def _dedup_rows(nbr):
        s = np.sort(nbr, axis=1)
        dup = np.concatenate(
            [np.zeros((s.shape[0], 1), bool), s[:, 1:] == s[:, :-1]], axis=1
        )
        return np.where(dup, EMPTY, s)


def cold_sample_callback(
    host_sampler: HostColdSampler,
    frontier: jax.Array,
    key_data: jax.Array,
    fanout: int,
    num_cache_node: int,
    cold_cap: int,
):
    """Serve frontier nodes outside the device topology prefix from the host
    CSR (inside shard_map).  Returns ``(neigh (cap, K), cold_mask, overflow)``
    where ``neigh`` has rows only at cold positions (EMPTY elsewhere)."""
    cap = frontier.shape[0]
    cold_cap = min(cold_cap, cap)  # shallow layers have small frontiers
    valid = frontier != EMPTY
    cold = valid & (frontier >= num_cache_node)
    num_cold = jnp.sum(cold).astype(jnp.int32)
    from ..ops.unique import compact_mask_positions

    cold_pos = compact_mask_positions(cold, cold_cap)
    in_range = jnp.arange(cold_cap) < num_cold
    cold_ids = jnp.where(in_range, frontier[cold_pos], EMPTY)

    drawn = jax.pure_callback(
        lambda ids, kd: host_sampler(ids, kd, fanout),
        jax.ShapeDtypeStruct((cold_cap, fanout), jnp.int32),
        cold_ids,
        key_data,
    )
    neigh = jnp.full((cap, fanout), EMPTY, jnp.int32)
    tgt = jnp.where(in_range, cold_pos, cap)
    neigh = neigh.at[tgt].set(drawn, mode="drop")
    return neigh, cold, num_cold > cold_cap
