"""Full-graph SpMM / SDDMM bandwidth bench (BASELINE.json north-star line:
"SpMM/SDDMM must hit speed-of-light HBM bandwidth per chip").

Times `ops.spmm.spmm_csr` (the full-neighbor aggregation behind layer-wise
inference, inference.py) and `gat_aggregate_csr` (SDDMM + edge-softmax +
weighted SpMM) at products scale, and reports effective GB/s against the
speed-of-light byte count:

  SpMM bytes >= E * (F*fb  [gathered row] + 4 [index] ) + 2*N*F*fb
               (accumulator is re-read/re-written once per CHUNK pass —
                the lower bound counts it once)

Also A/Bs the scatter-add with `indices_are_sorted=True`: CSR edge order
makes the destination rows nondecreasing across the edge stream, which the
round-2 implementation never told XLA.

Usage: python evaluation/microbench/spmm_bench.py [--small]
Appends to spmm_bench.tsv.
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--feat", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from run import timeit  # evaluation/microbench helpers
    from xgnn_tpu.ops.spmm import gat_aggregate_csr, spmm_csr
    from xgnn_tpu.synthetic_device import make_device_dataset

    nodes, edges = (30_000, 300_000) if args.small else (
        2_449_029, 62_000_000
    )
    f = 16 if args.small else args.feat
    ds = make_device_dataset(
        nodes, edges, f, 8, train_frac=0.05, seed=0, name="spmm_bench",
        dedup=False,
    )
    g = ds.graph
    n, e = g.num_node, g.num_edge
    h = jax.random.normal(jax.random.key(0), (n, f), jnp.float32)

    spmm = functools.partial(spmm_csr, num_node=n)
    t_spmm = timeit(
        jax.jit(lambda ip, ix, h: spmm(ip, ix, h)), g.indptr, g.indices, h,
        iters=5,
    )
    bytes_min = e * (f * 4 + 4) + 2 * n * f * 4

    # A/B: the same kernel WITHOUT the indices_are_sorted hint (the round-2
    # implementation) — inline copy so both variants run in one session

    @functools.partial(jax.jit, static_argnames=())
    def spmm_unsorted(indptr, indices, h):
        chunk = 1 << 20
        num_edge = indices.shape[0]  # tile-padded, like spmm_csr sees it
        f_ = h.shape[1]
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
                jnp.searchsorted(indptr, eids, side="right").astype(
                    jnp.int32
                ) - 1
            )
            valid = eids < num_edge
            vals = jnp.take(h, nbrs, axis=0, mode="clip")
            vals = vals * valid[:, None].astype(h.dtype)
            return acc.at[jnp.where(valid, rows, n)].add(
                vals, mode="drop"
            ), None

        acc = jnp.zeros((n, f_), h.dtype)
        acc, _ = jax.lax.scan(body, acc, (epos, idx_chunks))
        return acc

    t_uns = timeit(spmm_unsorted, g.indptr, g.indices, h, iters=5)
    print(
        f"test_result:spmm_sorted_hint:sorted_ms={t_spmm*1e3:.1f}:"
        f"unsorted_ms={t_uns*1e3:.1f}"
    )

    # degree-bucketed plan (gather+reduce, no per-edge scatter)
    from xgnn_tpu.ops.spmm import build_spmm_plan, spmm_csr_planned

    indptr_host = np.asarray(g.indptr)[: n + 1]
    plan, meta = build_spmm_plan(indptr_host)
    t_plan = timeit(
        lambda idx, x: spmm_csr_planned(plan, meta, idx, x),
        g.indices, h, iters=5,
    )
    gbps_p = bytes_min / t_plan / 1e9
    print(
        f"test_result:spmm_planned:ms={t_plan*1e3:.1f}:GBps={gbps_p:.1f}:"
        f"edges_per_s={e/t_plan/1e6:.1f}M"
    )

    # the INFERENCE-default plan: fine_buckets (3*2^k midpoint caps, slab
    # fill 0.70 -> 0.84 — fewer padded picks for the spread block to absorb)
    plan_f, meta_f = build_spmm_plan(indptr_host, fine_buckets=True)
    t_fine = timeit(
        lambda idx, x: spmm_csr_planned(plan_f, meta_f, idx, x),
        g.indices, h, iters=5,
    )
    print(
        f"test_result:spmm_planned_fine:ms={t_fine*1e3:.1f}:"
        f"GBps={bytes_min/t_fine/1e9:.1f}:edges_per_s={e/t_fine/1e6:.1f}M"
    )

    # the round-5 INFERENCE default: fine buckets + pre-expanded neighbor-id
    # matrices (materialize_plan_ids) — no id fetch in the hot loop
    from xgnn_tpu.ops.spmm import materialize_plan_ids

    materialize_plan_ids(plan_f, meta_f, g.indices, n)
    t_pre = timeit(
        lambda idx, x: spmm_csr_planned(plan_f, meta_f, idx, x),
        g.indices, h, iters=5,
    )
    print(
        f"test_result:spmm_planned_pre:ms={t_pre*1e3:.1f}:"
        f"GBps={bytes_min/t_pre/1e9:.1f}:edges_per_s={e/t_pre/1e6:.1f}M"
    )

    # variant: VMEM-sized slabs (4 MB) — if the (chunk, cap, F) slab was
    # round-tripping HBM before the reduce, small slabs let XLA keep it
    # on-chip
    t_p4 = timeit(
        lambda idx, x: spmm_csr_planned(
            plan, {**meta, "slab_bytes": 1 << 22}, idx, x
        ),
        g.indices, h, iters=5,
    )
    print(
        f"test_result:spmm_planned_4mb:ms={t_p4*1e3:.1f}:"
        f"GBps={bytes_min/t_p4/1e9:.1f}"
    )

    # variant: unrolled per-pick accumulate (the models' fanout_reduce
    # pattern, measured 114 GB/s at K=5) with hubs split at cap 64 — the
    # (chunk, F) accumulator stays on-chip across the unrolled adds
    plan64, meta64 = build_spmm_plan(indptr_host, max_cap=64)

    import jax as _jax

    def _bucket_unrolled(out, indices, h, nodes, starts, lens, cap, chunk):
        steps = nodes.shape[0] // chunk

        def body(out, i):
            sl = lambda a: _jax.lax.dynamic_slice_in_dim(
                a, i * chunk, chunk
            )
            nd, st, ln = sl(nodes), sl(starts), sl(lens)
            acc = jnp.zeros((chunk, h.shape[1]), h.dtype)
            for j in range(cap):
                v = j < ln
                nbr = jnp.take(
                    indices, jnp.where(v, st + j, 0), mode="clip"
                )
                rows = jnp.take(h, nbr, axis=0, mode="clip")
                acc = acc + rows * v[:, None].astype(h.dtype)
            return out.at[nd].add(acc, mode="drop"), None

        out, _ = _jax.lax.scan(body, out, jnp.arange(steps))
        return out

    bucket_jits = {}

    def spmm_unrolled(idx, x):
        out = jnp.zeros((n, x.shape[1]), x.dtype)
        for b in plan64:
            cap = b["cap"]
            chunk = max((1 << 22) // (x.shape[1] * 4), 256)
            nt = len(b["nodes"])
            padded = -(-nt // chunk) * chunk
            pad = padded - nt
            nodes = np.concatenate(
                [b["nodes"], np.full(pad, n, np.int32)]
            )
            starts = np.concatenate([b["starts"], np.zeros(pad, np.int32)])
            lens = np.concatenate([b["lens"], np.zeros(pad, np.int32)])
            key = (cap, padded // chunk)
            if key not in bucket_jits:
                bucket_jits[key] = _jax.jit(
                    functools.partial(
                        _bucket_unrolled, cap=cap, chunk=chunk
                    )
                )
            out = bucket_jits[key](
                out, idx, x, jnp.asarray(nodes), jnp.asarray(starts),
                jnp.asarray(lens),
            )
        return out

    t_unr = timeit(spmm_unrolled, g.indices, h, iters=5)
    print(
        f"test_result:spmm_unrolled64:ms={t_unr*1e3:.1f}:"
        f"GBps={bytes_min/t_unr/1e9:.1f}:edges_per_s={e/t_unr/1e6:.1f}M"
    )
    if not args.small:
        ref = spmm(g.indptr, g.indices, h)
        got = spmm_unrolled(g.indices, h)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"test_result:spmm_unrolled64_maxerr={err:.2e}")
    gbps = bytes_min / t_spmm / 1e9
    eps = e / t_spmm

    # SDDMM + edge softmax + weighted SpMM (H=1)
    feat3 = h.reshape(n, 1, f)
    el = jax.random.normal(jax.random.key(1), (n, 1), jnp.float32)
    er = jax.random.normal(jax.random.key(2), (n, 1), jnp.float32)
    gat = functools.partial(gat_aggregate_csr, num_node=n)
    t_gat = timeit(
        jax.jit(lambda ip, ix, x, a, b: gat(ip, ix, x, a, b)),
        g.indptr, g.indices, feat3, el, er, iters=5,
    )
    gat_eps = e / t_gat

    from xgnn_tpu.ops.spmm import gat_aggregate_planned

    t_gatp = timeit(
        lambda idx, x, a, b: gat_aggregate_planned(plan, meta, idx, x, a, b),
        g.indices, feat3, el, er, iters=5,
    )
    print(
        f"test_result:sddmm_gat_planned:ms={t_gatp*1e3:.1f}:"
        f"edges_per_s={e/t_gatp/1e6:.1f}M"
    )

    # fine buckets + pre-expanded ids (the inference default): plan_f was
    # materialized above, reuse it for the SDDMM pair of passes
    t_gatpre = timeit(
        lambda idx, x, a, b: gat_aggregate_planned(
            plan_f, meta_f, idx, x, a, b
        ),
        g.indices, feat3, el, er, iters=5,
    )
    print(
        f"test_result:sddmm_gat_planned_pre:ms={t_gatpre*1e3:.1f}:"
        f"edges_per_s={e/t_gatpre/1e6:.1f}M"
    )

    # control: PURE random-row gather+reduce at edge scale (no buckets, no
    # CSR) — separates "XLA gather issue rate at 100M+ rows" from any
    # bucketing overhead
    for nrows in ((1 << 22), e):
        pchunk = min(1 << 20, nrows)
        nfit = (nrows // pchunk) * pchunk
        if nfit == 0:
            continue
        ids = jax.random.randint(
            jax.random.key(7), (nrows,), 0, n, jnp.int32
        )

        @jax.jit
        def pure_gather(ids, h):
            chunk = pchunk
            steps = ids.shape[0] // chunk

            def body(acc, i):
                sl = jax.lax.dynamic_slice_in_dim(ids, i * chunk, chunk)
                return acc + jnp.take(h, sl, axis=0, mode="clip").sum(0), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((h.shape[1],), h.dtype), jnp.arange(steps)
            )
            return acc

        t_pg = timeit(pure_gather, ids[:nfit], h, iters=5)
        print(
            f"test_result:pure_gather:rows={nfit}:ms={t_pg*1e3:.1f}:"
            f"GBps={nfit*(f*4+4)/t_pg/1e9:.1f}"
        )

    mode = "cpu" if args.small else "tpu"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "spmm_bench.tsv"
    )
    header = not os.path.exists(out)
    with open(out, "a") as fh:
        if header:
            fh.write(
                "# mode\tN\tE\tF\tspmm_ms\tspmm_GBps\tspmm_edges_per_s\t"
                "gat_ms\tgat_edges_per_s\n"
            )
        fh.write(
            f"{mode}\t{n}\t{e}\t{f}\t{t_spmm*1e3:.1f}\t{gbps:.1f}\t"
            f"{eps/1e6:.1f}M\t{t_gat*1e3:.1f}\t{gat_eps/1e6:.1f}M\n"
        )
    print(
        f"test_result:spmm:ms={t_spmm*1e3:.1f}:GBps={gbps:.1f}:"
        f"edges_per_s={eps/1e6:.1f}M"
    )
    print(f"test_result:sddmm_gat:ms={t_gat*1e3:.1f}:edges_per_s={gat_eps/1e6:.1f}M")
    print(f"# appended to {out}")


if __name__ == "__main__":
    main()
