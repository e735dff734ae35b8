"""Full-graph sparse aggregation (SpMM) over CSR.

The reference's full-graph path runs cusparse COO SpMM
(``sam_backend/scattergather.cu:48-112``); DGL uses the same for its
baselines.  On TPU, an (E, F) edge-feature materialization is not viable at
100M+ edges, so the SpMM streams over edge chunks: each ``lax.scan`` step
gathers a chunk of neighbor rows and scatter-adds into the node accumulator.
Chunk size trades VMEM pressure for scan length; every op in the loop is a
gather + scatter-add that XLA pipelines against HBM.

Used by full-neighbor layer-wise inference (``xgnn_tpu.inference``) — the
training path never materializes full-graph products (it aggregates over
sampled fanouts instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# rows appended to gathered tables for masked picks: a BLOCK (not one row)
# so invalid picks spread over distinct rows — repeated gather indices
# collide (collision_bench.tsv); 128 rows = one tile column, 64 KB at F=128
PAD_ROWS = 128


@functools.partial(jax.jit, static_argnames=("num_node", "chunk", "mean"))
def spmm_csr(
    indptr: jax.Array,
    indices: jax.Array,
    h: jax.Array,
    *,
    num_node: int,
    chunk: int = 1 << 20,
    mean: bool = False,
) -> jax.Array:
    """out[v] = sum/mean over neighbors u of h[u] (CSR rows = v)."""
    num_edge = indices.shape[0]
    f = h.shape[1]
    # row id per edge: searchsorted over indptr, computed chunk-wise
    num_chunks = -(-num_edge // chunk)
    pad = num_chunks * chunk - num_edge
    idx_pad = jnp.concatenate([indices, jnp.zeros(pad, indices.dtype)])
    epos = jnp.arange(num_chunks * chunk, dtype=jnp.int32).reshape(
        num_chunks, chunk
    )
    idx_chunks = idx_pad.reshape(num_chunks, chunk)

    def body(acc, inputs):
        eids, nbrs = inputs
        rows = (
            jnp.searchsorted(indptr, eids, side="right").astype(jnp.int32) - 1
        )
        valid = eids < num_edge
        vals = jnp.take(h, nbrs, axis=0, mode="clip")
        vals = vals * valid[:, None].astype(h.dtype)
        # CSR edge order makes destination rows nondecreasing within the
        # chunk (padding maps to num_node, beyond every real row) — tell
        # XLA so the scatter lowers to the sorted-segment path
        acc = acc.at[jnp.where(valid, rows, num_node)].add(
            vals, mode="drop", indices_are_sorted=True
        )
        return acc, None

    acc = jnp.zeros((num_node, f), h.dtype)
    acc, _ = jax.lax.scan(body, acc, (epos, idx_chunks))
    if mean:
        deg = (indptr[1:] - indptr[:-1]).astype(h.dtype)
        acc = acc / jnp.maximum(deg, 1.0)[:, None]
    return acc


@functools.partial(jax.jit, static_argnames=("num_node", "chunk"))
def segment_max_csr(
    indptr: jax.Array,
    indices: jax.Array,
    vals: jax.Array,
    *,
    num_node: int,
    chunk: int = 1 << 20,
    init: float = -1e30,
) -> jax.Array:
    """out[v] = max over neighbors u of vals[u] (CSR rows = v)."""
    num_edge = indices.shape[0]
    h = vals.shape[1]
    num_chunks = -(-num_edge // chunk)
    pad = num_chunks * chunk - num_edge
    idx_pad = jnp.concatenate([indices, jnp.zeros(pad, indices.dtype)])
    epos = jnp.arange(num_chunks * chunk, dtype=jnp.int32).reshape(
        num_chunks, chunk
    )
    idx_chunks = idx_pad.reshape(num_chunks, chunk)

    def body(acc, inputs):
        eids, nbrs = inputs
        rows = (
            jnp.searchsorted(indptr, eids, side="right").astype(jnp.int32) - 1
        )
        valid = eids < num_edge
        v = jnp.take(vals, nbrs, axis=0, mode="clip")
        v = jnp.where(valid[:, None], v, init)
        acc = acc.at[jnp.where(valid, rows, num_node)].max(
            v, mode="drop", indices_are_sorted=True
        )
        return acc, None

    acc = jnp.full((num_node, h), init, vals.dtype)
    acc, _ = jax.lax.scan(body, acc, (epos, idx_chunks))
    return acc


@functools.partial(jax.jit, static_argnames=("num_node", "chunk", "negative_slope"))
def gat_aggregate_csr(
    indptr: jax.Array,
    indices: jax.Array,
    feat: jax.Array,  # (N, H, D) projected features
    el: jax.Array,  # (N, H) dst-side attention terms
    er: jax.Array,  # (N, H) src-side attention terms
    *,
    num_node: int,
    chunk: int = 1 << 19,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Full-neighbor GAT aggregation (SDDMM + edge-softmax + SpMM) as one
    edge-chunked scan — the exact-inference analog of the sampled-path GAT.

    Numerically stable: leaky_relu is monotone, so the per-dst max of
    ``leaky(el[v] + er[u])`` is ``leaky(el[v] + max_u er[u])``, computed with
    one segment-max pass; the main scan then accumulates
    ``w = exp(e - m[v])`` and ``w * feat[u]``.
    """
    n, heads, d = feat.shape
    m = jax.nn.leaky_relu(
        el + segment_max_csr(indptr, indices, er, num_node=num_node),
        negative_slope=negative_slope,
    )  # (N, H)

    num_edge = indices.shape[0]
    num_chunks = -(-num_edge // chunk)
    pad = num_chunks * chunk - num_edge
    idx_pad = jnp.concatenate([indices, jnp.zeros(pad, indices.dtype)])
    epos = jnp.arange(num_chunks * chunk, dtype=jnp.int32).reshape(
        num_chunks, chunk
    )
    idx_chunks = idx_pad.reshape(num_chunks, chunk)

    def body(carry, inputs):
        s_num, s_den = carry
        eids, nbrs = inputs
        rows = (
            jnp.searchsorted(indptr, eids, side="right").astype(jnp.int32) - 1
        )
        valid = eids < num_edge
        e = jax.nn.leaky_relu(
            jnp.take(el, rows, axis=0, mode="clip")
            + jnp.take(er, nbrs, axis=0, mode="clip"),
            negative_slope=negative_slope,
        )
        w = jnp.exp(e - jnp.take(m, rows, axis=0, mode="clip"))
        w = jnp.where(valid[:, None], w, 0.0)  # (chunk, H)
        fv = jnp.take(feat, nbrs, axis=0, mode="clip")  # (chunk, H, D)
        tgt = jnp.where(valid, rows, num_node)
        s_num = s_num.at[tgt].add(
            fv * w[..., None], mode="drop", indices_are_sorted=True
        )
        s_den = s_den.at[tgt].add(w, mode="drop", indices_are_sorted=True)
        return (s_num, s_den), None

    s_num = jnp.zeros((num_node, heads, d), feat.dtype)
    s_den = jnp.zeros((num_node, heads), feat.dtype)
    (s_num, s_den), _ = jax.lax.scan(body, (s_num, s_den), (epos, idx_chunks))
    return s_num / jnp.maximum(s_den, 1e-9)[..., None]


# ---------------------------------------------------------------- planned
# Degree-bucketed SpMM: the edge-scatter formulation above runs ~3 GB/s at
# 100M-edge scale (spmm_bench.tsv) — every edge pays a row scatter-add into
# the (N, F) accumulator.  The TPU-right shape is gather+REDUCE: group
# nodes by padded degree (powers of two), gather each group's neighbor rows
# as a dense (tasks, cap, F) slab, and sum over the cap axis — no per-edge
# scatter exists; the only scatter left is ONE row add per TASK (~N rows
# instead of E).  Hubs with deg > the largest cap split into multiple tasks
# that accumulate into the same output row.


def build_spmm_plan(indptr, max_cap: int = 2048, slab_bytes: int = 1 << 26,
                    indices=None, src_block: int = 0,
                    fine_buckets: bool = False):
    """Host-side planning: bucket (node, start, len<=cap) tasks by padded
    degree.  Returns a list of per-bucket dicts with device-ready arrays;
    build once per graph, reuse for every layer/epoch.

    ``src_block > 0`` (needs ``indices``) additionally TILES the gather by
    source-id range: adjacency is sorted within each node's run (sum /
    segment-softmax aggregation is order-invariant), each run splits into
    one contiguous subrun per ``src_block``-row source block, and tasks are
    ordered block-major within every bucket — so each scan chunk's h-row
    gathers land in one ~``src_block*F*4``-byte window instead of sweeping
    the full table (HBM locality; measured in gather_locality_bench.tsv).
    The reordered edge array comes back as ``plan_meta["indices"]`` — pass
    THAT to the planned kernels instead of the original."""
    import numpy as np

    indptr = np.asarray(indptr)
    if len(indptr) and int(indptr[-1]) >= 2**31:
        # task starts are int32 device scalars (like every other device
        # edge offset — PARITY §2.1 big-offset design); a >=2^31-edge
        # full-graph plan would wrap them negative.  Such graphs (14+ GB
        # of indices alone) exceed one chip's HBM regardless — refuse
        # loudly instead of gathering from garbage positions.
        raise ValueError(
            f"full-graph SpMM plan over {int(indptr[-1])} edges needs "
            ">= 2^31 edge offsets, which device-side plans keep int32; "
            "run layer-wise inference on a node-range partition of the "
            "graph (offsets rebased per range) instead"
        )
    deg = np.diff(indptr).astype(np.int64)
    n = len(deg)
    idx_out = None
    if src_block:
        if indices is None:
            raise ValueError("src_block tiling needs the indices array")
        num_edge = int(indptr[-1])
        idx = np.asarray(indices)[:num_edge].astype(np.int64)
        v = np.repeat(np.arange(n, dtype=np.int64), deg)
        order = np.argsort(v * n + idx, kind="stable")
        idx_sorted = idx[order]
        blk = (idx_sorted // src_block).astype(np.int32)
        # subrun boundaries: node change (CSR runs stay contiguous under
        # the within-run sort) or block change
        change = np.empty(num_edge, bool)
        change[0] = True
        change[1:] = (v[order][1:] != v[order][:-1]) | (blk[1:] != blk[:-1])
        t_start = np.nonzero(change)[0]
        t_len = np.diff(np.append(t_start, num_edge))
        t_node = v[order][t_start]
        t_blk = blk[t_start]
        # split subruns longer than max_cap
        nseg = -(-t_len // max_cap)
        reps = nseg.astype(np.int64)
        nodes = np.repeat(t_node, reps).astype(np.int32)
        blks = np.repeat(t_blk, reps)
        base = np.repeat(t_start, reps)
        within = np.arange(reps.sum()) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        starts = (base + within * max_cap).astype(np.int32)
        lens = np.minimum(
            np.repeat(t_len, reps) - within * max_cap, max_cap
        ).astype(np.int32)
        # block-major task order (stable: nodes stay grouped within block)
        bo = np.argsort(blks, kind="stable")
        nodes, starts, lens = nodes[bo], starts[bo], lens[bo]
        idx_out = idx_sorted.astype(np.asarray(indices).dtype)
    else:
        nodes_all, starts_all, lens_all = [], [], []
        # split hubs into cap-sized segments
        nseg = -(-np.maximum(deg, 1) // max_cap)
        for s in range(int(nseg.max())):
            sel = np.nonzero(nseg > s)[0]
            off = s * max_cap
            nodes_all.append(sel)
            starts_all.append((indptr[sel] + off).astype(np.int64))
            lens_all.append(np.minimum(deg[sel] - off, max_cap))
        nodes = np.concatenate(nodes_all).astype(np.int32)
        # edge positions: int32 everywhere else in the framework
        # (indptr is int32) — same <2^31 edge-count envelope
        starts = np.concatenate(starts_all).astype(np.int32)
        lens = np.concatenate(lens_all).astype(np.int32)
        keep = lens > 0
        nodes, starts, lens = nodes[keep], starts[keep], lens[keep]

    plan = []
    if fine_buckets:
        # pow2 caps pad tasks to avg fill 0.75 — and the h-row gather is
        # TRANSACTION-bound (gather_locality_bench.tsv), so every padded
        # slot costs a real transaction on the appended zero row.  Adding
        # the 3*2^k midpoints lifts avg fill to ~0.87 at the price of ~2x
        # the bucket compilations.
        caps_list = sorted(
            c
            for c in {1 << k for k in range(21)}
            | {3 << k for k in range(20)}
            | {max_cap}
            if c <= max_cap
        )
    else:
        caps_list = sorted(
            {1 << k for k in range(21) if (1 << k) <= max_cap} | {max_cap}
        )
    prev = 0
    for cap in caps_list:
        lo, hi = prev + 1, cap
        prev = cap
        sel = np.nonzero((lens >= lo) & (lens <= hi))[0]
        if len(sel):
            plan.append({
                "cap": int(cap),
                "nodes": nodes[sel],
                "starts": starts[sel],
                "lens": lens[sel],
            })
    plan_meta = {"num_node": n, "slab_bytes": int(slab_bytes)}
    if idx_out is not None:
        plan_meta["indices"] = idx_out  # block-sorted edges; upload and use
    return plan, plan_meta


def _next_pow2(x: int) -> int:
    return 1 << max(int(x - 1).bit_length(), 0)


def materialize_plan_ids(plan, plan_meta, indices, num_node: int):
    """One-time on-device expansion of every bucket's padded neighbor-id
    matrix (+ chunk-granule task padding).

    The planned kernels originally fetched neighbor ids in the hot loop
    (``take_runs`` covering-tile reads + lane select): at products scale
    that is **1.68 s of a 3.18 s SpMM** — with ids pre-expanded the same
    pass runs at the chip's measured random-row transaction floor
    (spmm_attrib.tsv: 3175 → 1493 ms, 20.9 → 44.5 GB/s ≈ the 42.4 GB/s
    flat gather+reduce control).  Cost: ``rows/fill`` int32 HBM (~590 MB at
    products scale — about the indices array again), paid once per graph
    and reused by every layer/epoch of full-graph inference.

    Buckets are padded to a power-of-two task granule so any power-of-two
    chunk divides them (feature width changes the chunk per layer).
    Invalid slots spread over the appended PAD_ROWS zero block
    (collision_bench.tsv).  Mutates and returns ``plan``.
    """
    from .tiled import take_runs

    @functools.partial(jax.jit, static_argnames=("cap", "pad_base"))
    def _expand(indices, starts, lens, *, cap, pad_base):
        j = jnp.arange(cap, dtype=jnp.int32)
        valid = j[None, :] < lens[:, None]
        spread = (
            jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0) * cap
            + jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
        ) % PAD_ROWS
        return jnp.where(
            valid, take_runs(indices, starts, cap), pad_base + spread
        )

    import numpy as np

    pad_base = num_node  # h is appended with PAD_ROWS zero rows at [n:]
    for b in plan:
        nt = len(b["nodes"])
        g = min(8192, _next_pow2(max(nt, 8)))
        nt_pad = -(-nt // g) * g
        st = np.concatenate(
            [b["starts"], np.zeros(nt_pad - nt, np.int32)]
        )
        ln = np.concatenate([b["lens"], np.zeros(nt_pad - nt, np.int32)])
        b["nbr"] = _expand(
            indices, jnp.asarray(st), jnp.asarray(ln),
            cap=int(b["cap"]), pad_base=pad_base,
        )
        b["nodes_pad"] = jnp.asarray(
            np.concatenate(
                [b["nodes"], np.full(nt_pad - nt, num_node, np.int32)]
            )
        )
        b["granule"] = g
    return plan


@functools.partial(
    jax.jit, static_argnames=("cap", "chunk", "mean_weight")
)
def _bucket_pass_pre(out, nbr, h, nodes, inv_deg, *, cap, chunk,
                     mean_weight):
    """:func:`_bucket_pass` over a pre-expanded neighbor-id matrix — no
    id fetch in the hot loop (see :func:`materialize_plan_ids`)."""
    steps = nodes.shape[0] // chunk

    def body(out, i):
        nb = jax.lax.dynamic_slice_in_dim(nbr, i * chunk, chunk)
        nd = jax.lax.dynamic_slice_in_dim(nodes, i * chunk, chunk)
        rows = jnp.take(h, nb, axis=0, mode="clip")
        part = rows.sum(axis=1)
        if mean_weight:
            part = part * jnp.take(inv_deg, nd, mode="clip")[:, None]
        return out.at[nd].add(part, mode="drop"), None

    out, _ = jax.lax.scan(body, out, jnp.arange(steps))
    return out


@functools.partial(
    jax.jit, static_argnames=("cap", "chunk", "num_node", "mean_weight")
)
def _bucket_pass(
    out, indices, h, nodes, starts, lens, inv_deg, *,
    cap, chunk, num_node, mean_weight,
):
    """Sum each task's <=cap neighbor rows and add into its output row.
    Tasks are padded to a chunk multiple with node == num_node (dropped)."""
    nt = nodes.shape[0]
    steps = nt // chunk

    def body(out, i):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        nd, st, ln = sl(nodes), sl(starts), sl(lens)
        j = jnp.arange(cap, dtype=jnp.int32)
        valid = j[None, :] < ln[:, None]
        # each task's neighbor ids are one CONTIGUOUS CSR run: fetch the
        # covering tiles once per task and select lanes locally
        # (take_1d would fetch a full 512 B tile per EDGE — doubling the
        # kernel's HBM traffic; measured in spmm_bench.tsv)
        from .tiled import take_runs

        nbr = take_runs(indices, st, cap)
        # invalid picks gather the appended zero BLOCK — no full-slab mask
        # multiply pass, and the picks spread over PAD_ROWS distinct rows:
        # parking them all on one row serializes the transactions that hit
        # it (collision_bench.tsv — at avg fill 0.87, 13% of picks would
        # share a single row)
        spread = (
            jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0) * cap
            + jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
        ) % PAD_ROWS
        nbr = jnp.where(valid, nbr, h.shape[0] - PAD_ROWS + spread)
        rows = jnp.take(h, nbr, axis=0, mode="clip")
        part = rows.sum(axis=1)
        if mean_weight:
            part = part * jnp.take(inv_deg, nd, mode="clip")[:, None]
        return out.at[nd].add(part, mode="drop"), None

    out, _ = jax.lax.scan(body, out, jnp.arange(steps))
    return out


def spmm_csr_planned(plan, plan_meta, indices, h, *, mean: bool = False,
                     inv_deg=None):
    """Degree-bucketed full-graph aggregation: ``out[v] = sum/mean over
    neighbors u of h[u]`` using a :func:`build_spmm_plan` plan."""
    import numpy as np

    num_node = plan_meta["num_node"]
    f = h.shape[1]
    # PAD_ROWS zero rows for masked picks (a 64 KB append instead of a mask
    # pass per slab; a BLOCK so the picks spread — see _bucket_pass)
    h = jnp.concatenate([h, jnp.zeros((PAD_ROWS, f), h.dtype)])
    out = jnp.zeros((num_node, f), h.dtype)
    if mean and inv_deg is None:
        raise ValueError("mean=True needs inv_deg (1/deg, 0 for isolated)")
    if inv_deg is None:
        inv_deg = jnp.zeros((num_node,), h.dtype)
    for b in plan:
        cap = b["cap"]
        nt = len(b["nodes"])
        if "nbr" in b:
            # pre-expanded ids (materialize_plan_ids): chunk is a power of
            # two <= the bucket granule, so it divides the padded task count
            chunk = max(int(plan_meta["slab_bytes"] // (cap * f * 4)), 8)
            chunk = min(_next_pow2(chunk + 1) >> 1, b["granule"])
            out = _bucket_pass_pre(
                out, b["nbr"], h, b["nodes_pad"], inv_deg,
                cap=cap, chunk=chunk, mean_weight=mean,
            )
            continue
        chunk = max(int(plan_meta["slab_bytes"] // (cap * f * 4)), 8)
        # never pad a small bucket to a giant chunk: cap the chunk at the
        # bucket's next power of two (padding waste <= 2x)
        import math
        chunk = min(chunk, 1 << max(int(math.ceil(math.log2(max(nt, 8)))), 3))
        padded = -(-nt // chunk) * chunk
        pad = padded - nt
        nodes = np.concatenate(
            [b["nodes"], np.full(pad, num_node, np.int32)]
        )
        starts = np.concatenate([b["starts"], np.zeros(pad, np.int32)])
        lens = np.concatenate([b["lens"], np.zeros(pad, np.int32)])
        out = _bucket_pass(
            out, indices, h, jnp.asarray(nodes), jnp.asarray(starts),
            jnp.asarray(lens), inv_deg,
            cap=cap, chunk=chunk, num_node=num_node, mean_weight=mean,
        )
    return out


@functools.partial(
    jax.jit, static_argnames=("cap", "chunk", "negative_slope")
)
def _gat_pass_max(m, indices, el, er, nodes, starts, lens, *,
                  cap, chunk, negative_slope):
    """Pass A of the bucketed segment softmax: per-node running max of
    leaky_relu(el[v] + er[u]).  ``er`` carries an appended -inf BLOCK so
    masked slots never win the max (spread — see _bucket_pass); padding
    tasks scatter-drop."""
    from .tiled import take_runs

    steps = nodes.shape[0] // chunk

    def body(m, i):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        nd, st, ln = sl(nodes), sl(starts), sl(lens)
        j = jnp.arange(cap, dtype=jnp.int32)
        valid = j[None, :] < ln[:, None]
        spread = (
            jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0) * cap
            + jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
        ) % PAD_ROWS
        nbr = jnp.where(
            valid, take_runs(indices, st, cap),
            er.shape[0] - PAD_ROWS + spread,
        )
        e = jax.nn.leaky_relu(
            jnp.take(el, nd, axis=0, mode="clip")[:, None, :]
            + jnp.take(er, nbr, axis=0, mode="clip"),
            negative_slope=negative_slope,
        )  # (chunk, cap, H)
        return m.at[nd].max(e.max(axis=1), mode="drop"), None

    m, _ = jax.lax.scan(body, m, jnp.arange(steps))
    return m


@functools.partial(
    jax.jit, static_argnames=("cap", "chunk", "negative_slope")
)
def _gat_pass_sum(carry, indices, feat, el, er, m, nodes, starts, lens, *,
                  cap, chunk, negative_slope):
    """Pass B: accumulate exp(e - m[v]) weights and weighted features.
    ``feat``/``er`` carry appended zero/-inf rows so masked slots
    contribute exactly zero."""
    from .tiled import take_runs

    steps = nodes.shape[0] // chunk

    def body(carry, i):
        s_num, s_den = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        nd, st, ln = sl(nodes), sl(starts), sl(lens)
        j = jnp.arange(cap, dtype=jnp.int32)
        valid = j[None, :] < ln[:, None]
        spread = (
            jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0) * cap
            + jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
        ) % PAD_ROWS
        nbr = jnp.where(
            valid, take_runs(indices, st, cap),
            er.shape[0] - PAD_ROWS + spread,
        )
        e = jax.nn.leaky_relu(
            jnp.take(el, nd, axis=0, mode="clip")[:, None, :]
            + jnp.take(er, nbr, axis=0, mode="clip"),
            negative_slope=negative_slope,
        )
        w = jnp.exp(e - jnp.take(m, nd, axis=0, mode="clip")[:, None, :])
        fv = jnp.take(feat, nbr, axis=0, mode="clip")  # (chunk, cap, H, D)
        s_num = s_num.at[nd].add(
            jnp.sum(fv * w[..., None], axis=1), mode="drop"
        )
        s_den = s_den.at[nd].add(w.sum(axis=1), mode="drop")
        return (s_num, s_den), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(steps))
    return carry


@functools.partial(
    jax.jit, static_argnames=("cap", "chunk", "negative_slope")
)
def _gat_pass_max_pre(m, nbr, el, er, nodes, *, cap, chunk,
                      negative_slope):
    """:func:`_gat_pass_max` over pre-expanded neighbor ids."""
    steps = nodes.shape[0] // chunk

    def body(m, i):
        nb = jax.lax.dynamic_slice_in_dim(nbr, i * chunk, chunk)
        nd = jax.lax.dynamic_slice_in_dim(nodes, i * chunk, chunk)
        e = jax.nn.leaky_relu(
            jnp.take(el, nd, axis=0, mode="clip")[:, None, :]
            + jnp.take(er, nb, axis=0, mode="clip"),
            negative_slope=negative_slope,
        )
        return m.at[nd].max(e.max(axis=1), mode="drop"), None

    m, _ = jax.lax.scan(body, m, jnp.arange(steps))
    return m


@functools.partial(
    jax.jit, static_argnames=("cap", "chunk", "negative_slope")
)
def _gat_pass_sum_pre(carry, nbr, feat, el, er, m, nodes, *, cap, chunk,
                      negative_slope):
    """:func:`_gat_pass_sum` over pre-expanded neighbor ids."""
    steps = nodes.shape[0] // chunk

    def body(carry, i):
        s_num, s_den = carry
        nb = jax.lax.dynamic_slice_in_dim(nbr, i * chunk, chunk)
        nd = jax.lax.dynamic_slice_in_dim(nodes, i * chunk, chunk)
        e = jax.nn.leaky_relu(
            jnp.take(el, nd, axis=0, mode="clip")[:, None, :]
            + jnp.take(er, nb, axis=0, mode="clip"),
            negative_slope=negative_slope,
        )
        w = jnp.exp(e - jnp.take(m, nd, axis=0, mode="clip")[:, None, :])
        fv = jnp.take(feat, nb, axis=0, mode="clip")
        s_num = s_num.at[nd].add(
            jnp.sum(fv * w[..., None], axis=1), mode="drop"
        )
        s_den = s_den.at[nd].add(w.sum(axis=1), mode="drop")
        return (s_num, s_den), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(steps))
    return carry


def gat_aggregate_planned(
    plan, plan_meta, indices, feat, el, er, *, negative_slope: float = 0.2
):
    """Degree-bucketed full-graph GAT aggregation (SDDMM + exact segment
    softmax + weighted SpMM) — the planned analog of
    :func:`gat_aggregate_csr`, whose per-edge scatters run ~2.4M edges/s at
    products scale (spmm_bench.tsv).  Two passes: per-node max, then
    exp-sum; hub nodes split across tasks stay EXACT because both passes
    accumulate through the per-node scatter (max / add)."""
    import numpy as np

    num_node = plan_meta["num_node"]
    n, heads, d = feat.shape
    NEG = jnp.asarray(-1e30, feat.dtype)
    # PAD_ROWS-row pads so masked picks spread over distinct rows
    er_x = jnp.concatenate([er, jnp.full((PAD_ROWS, heads), NEG, er.dtype)])
    feat_x = jnp.concatenate(
        [feat, jnp.zeros((PAD_ROWS, heads, d), feat.dtype)]
    )
    m = jnp.full((num_node, heads), NEG, feat.dtype)

    def padded(b, chunk):
        nt = len(b["nodes"])
        p = -(-nt // chunk) * chunk - nt
        return (
            jnp.asarray(np.concatenate(
                [b["nodes"], np.full(p, num_node, np.int32)]
            )),
            jnp.asarray(np.concatenate([b["starts"], np.zeros(p, np.int32)])),
            jnp.asarray(np.concatenate([b["lens"], np.zeros(p, np.int32)])),
        )

    import math

    chunks = {}
    for b in plan:
        cap = b["cap"]
        nt = len(b["nodes"])
        chunk = max(
            int(plan_meta["slab_bytes"] // (cap * max(heads * d, 1) * 4)), 8
        )
        if "nbr" in b:
            chunk = min(_next_pow2(chunk + 1) >> 1, b["granule"])
            chunks[id(b)] = chunk
            m = _gat_pass_max_pre(
                m, b["nbr"], el, er_x, b["nodes_pad"],
                cap=cap, chunk=chunk, negative_slope=negative_slope,
            )
            continue
        chunk = min(chunk, 1 << max(int(math.ceil(math.log2(max(nt, 8)))), 3))
        chunks[id(b)] = chunk
        nodes, starts, lens = padded(b, chunk)
        m = _gat_pass_max(
            m, indices, el, er_x, nodes, starts, lens,
            cap=cap, chunk=chunk, negative_slope=negative_slope,
        )
    s_num = jnp.zeros((num_node, heads, d), feat.dtype)
    s_den = jnp.zeros((num_node, heads), feat.dtype)
    for b in plan:
        cap = b["cap"]
        chunk = chunks[id(b)]
        if "nbr" in b:
            s_num, s_den = _gat_pass_sum_pre(
                (s_num, s_den), b["nbr"], feat_x, el, er_x, m,
                b["nodes_pad"],
                cap=cap, chunk=chunk, negative_slope=negative_slope,
            )
            continue
        nodes, starts, lens = padded(b, chunk)
        s_num, s_den = _gat_pass_sum(
            (s_num, s_den), indices, feat_x, el, er_x, m,
            nodes, starts, lens,
            cap=cap, chunk=chunk, negative_slope=negative_slope,
        )
    return s_num / jnp.maximum(s_den, 1e-9)[..., None]
