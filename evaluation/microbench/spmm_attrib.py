"""Planned-SpMM term attribution (round-5 verdict item 4).

The fine-bucket planned SpMM runs at 20.6 GB/s vs the 62 GB/s pure
gather+reduce control — "padding + id-fetch + scatters" was claimed but
never summed.  This probe times the kernel with components removed one at
a time, at products scale, so measured = sum-of-terms can be checked:

  A  planned fine-buckets (the shipped kernel)
  B  = A with neighbor ids PRECOMPUTED per bucket (removes take_runs +
     the where/spread select — isolates the id-fetch term)
  C  = B with `.at[].set` instead of `.at[].add` (no RMW accumulate —
     isolates the scatter-add term; WRONG results for split hubs, timing
     only)
  D  = C without the mean inv_deg multiply
  E  flat gather+sum control at the same total gathered rows (the 62 GB/s
     transaction floor, fill=1)

Appends to spmm_attrib.tsv.  Usage: python spmm_attrib.py [--small]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

HERE = os.path.dirname(os.path.abspath(__file__))


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

    from run import timeit
    from xgnn_tpu.ops.spmm import (
        PAD_ROWS,
        build_spmm_plan,
        spmm_csr_planned,
    )
    from xgnn_tpu.ops.tiled import take_runs
    from xgnn_tpu.synthetic_device import make_device_dataset

    nodes, edges = (30_000, 300_000) if args.small else (2_449_029, 62_000_000)
    f = 16 if args.small else args.feat
    ds = make_device_dataset(
        nodes, edges, f, 8, train_frac=0.05, seed=0, name="spmm_attrib",
        dedup=False,
    )
    g = ds.graph
    n, e = g.num_node, g.num_edge
    h = jax.random.normal(jax.random.key(0), (n + PAD_ROWS, f), jnp.float32)
    h = h.at[n:].set(0.0)

    indptr_host = np.asarray(g.indptr)[: n + 1]
    plan, meta = build_spmm_plan(indptr_host, fine_buckets=True)

    rows_total = sum(len(b["nodes"]) * b["cap"] for b in plan)
    print(f"# tasks={sum(len(b['nodes']) for b in plan)} "
          f"gathered_rows={rows_total} useful_edges={e} "
          f"fill={e/rows_total:.3f}", file=sys.stderr)

    # ---- A: shipped kernel
    t_a = timeit(
        lambda idx, x: spmm_csr_planned(plan, meta, idx, x),
        g.indices, h[: n], iters=3,
    )

    # ---- precompute per-bucket padded neighbor-id matrices (host)
    idx_host = np.asarray(g.indices)[:e].astype(np.int64)
    buckets_pre = []
    for b in plan:
        cap = b["cap"]
        st = b["starts"].astype(np.int64)
        ln = b["lens"].astype(np.int64)
        j = np.arange(cap, dtype=np.int64)[None, :]
        pos = np.minimum(st[:, None] + j, e - 1)
        nbr = idx_host[pos]
        valid = j < ln[:, None]
        spread = (np.arange(nbr.size).reshape(nbr.shape)) % PAD_ROWS
        nbr = np.where(valid, nbr, n + spread)
        buckets_pre.append({
            "cap": cap,
            "nodes": jnp.asarray(b["nodes"]),
            "nbr": jnp.asarray(nbr.astype(np.int32)),
            "inv": None,
        })

    chunkof = lambda cap: max(1, min(1 << 13, (meta["slab_bytes"] // max(
        cap * f * 4, 1))))

    @functools.partial(jax.jit, static_argnames=("chunk", "steps", "mode"))
    def _bucket(out, hh, nbr, nds, *, chunk, steps, mode):
        def body(out, i):
            nb = jax.lax.dynamic_slice_in_dim(nbr, i * chunk, chunk)
            nd = jax.lax.dynamic_slice_in_dim(nds, i * chunk, chunk)
            rows = jnp.take(hh, nb, axis=0, mode="clip")
            part = rows.sum(axis=1)
            if mode == "add":
                return out.at[nd].add(part, mode="drop"), None
            return out.at[nd].set(part, mode="drop"), None

        return jax.lax.scan(body, out, jnp.arange(steps))[0]

    padded = []
    for b in buckets_pre:
        cap = b["cap"]
        chunk = chunkof(cap)
        nt = b["nbr"].shape[0]
        steps = -(-nt // chunk)
        pad = steps * chunk - nt
        nbr = jnp.concatenate(
            [b["nbr"], jnp.full((pad, cap), n, jnp.int32)]
        ) if pad else b["nbr"]
        nds = jnp.concatenate(
            [b["nodes"], jnp.full((pad,), n, jnp.int32)]
        ) if pad else b["nodes"]
        padded.append((nbr, nds, chunk, steps))

    def run_pre(hh, mode):
        out = jnp.zeros((n, f), jnp.float32)
        for nbr, nds, chunk, steps in padded:
            out = _bucket(out, hh, nbr, nds, chunk=chunk, steps=steps,
                          mode=mode)
        return out

    t_b = timeit(functools.partial(run_pre, mode="add"), h, iters=3)
    t_c = timeit(functools.partial(run_pre, mode="set"), h, iters=3)

    # ---- E: flat gather+sum control at the same gathered-row count
    K = 64
    m = max((rows_total // (K * 4096)) * K * 4096, K * 4096)
    ids = jax.random.randint(jax.random.key(1), (m,), 0, n, jnp.int32)

    @jax.jit
    def control(hh, ids):
        r = ids.reshape(-1, K)
        steps = r.shape[0] // 4096

        def body(acc, i):
            nb = jax.lax.dynamic_slice_in_dim(r, i * 4096, 4096)
            rows = jnp.take(hh, nb, axis=0, mode="clip")
            return acc + rows.sum(axis=(0, 1)), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((f,), jnp.float32), jnp.arange(steps)
        )
        return acc

    t_e = timeit(control, h, ids, iters=3)
    # control covers steps*4096*K rows
    rows_e = (m // (K * 4096)) * 4096 * K

    bytes_min = e * (f * 4 + 4) + 2 * n * f * 4
    out = os.path.join(HERE, "spmm_attrib.tsv")
    new = not os.path.isfile(out)
    with open(out, "a") as fo:
        if new:
            fo.write(
                "# variant\tms\tGBps_vs_lower_bound\tnote\n"
            )
        rt = rows_total

        def row(name, t, note):
            fo.write(
                f"{name}\t{t*1e3:.0f}\t{bytes_min/t/1e9:.1f}\t{note}\n"
            )
            print(f"# {name}: {t*1e3:.0f} ms "
                  f"({bytes_min/t/1e9:.1f} GB/s)", file=sys.stderr)

        row("A_shipped_fine", t_a, f"fill={e/rt:.3f}")
        row("B_pre_ids_add", t_b, "A minus take_runs+select (ids precomputed)")
        row("C_pre_ids_set", t_c, "B minus scatter-add RMW (set; timing only)")
        t_e_scaled = t_e * rt / max(rows_e, 1)
        row("E_flat_control", t_e_scaled,
            f"pure gather+sum at {rt} rows (scaled from {rows_e})")
        fo.write(
            f"# attribution: id_fetch+select={1e3*(t_a-t_b):.0f} ms, "
            f"scatter_add={1e3*(t_b-t_c):.0f} ms, "
            f"pad+chunking_vs_control={1e3*(t_c-t_e_scaled):.0f} ms, "
            f"control_floor={1e3*t_e_scaled:.0f} ms\n"
        )
    print(f"# appended to {out}")


if __name__ == "__main__":
    main()
