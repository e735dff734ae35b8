"""Attribute GCN's step-time gap vs GraphSAGE (20.0M vs 25.0M edges/s/chip)
to its two extra memory passes — the block out-degree scatter-add and the
src-scale full-table multiply — by timing each in isolation at bench shapes.

The symmetric norm (DGL GraphConv ``norm='both'`` on sampled blocks,
reference example models) REQUIRES per-block src out-degrees: the
multiplicity of each src node among all picks.  Two formulations are timed
head-to-head:

- scatter: 5M-element scatter-add into a (2.45M,) table (transaction-bound,
  ~136M elem/s) + the full-table ``src_scale`` multiply — cost grows with
  the NODE table, which at small-batch shapes dominates the step;
- sort (``ops/degree.pick_multiplicity``, the production path): two
  streaming 2-op sorts over the picks + boundary fills — cost grows with
  EDGES only, and the resulting per-pick weight rides ``fanout_reduce``'s
  weights input so no table pass exists at all.

Usage: python evaluation/microbench/gcn_deg_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402

if os.environ.get("XGNN_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(out)
    sync_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - sync_cost), 1e-9) / iters


def main():
    # bench shapes: layer-0 block of the products-scale run
    src, dst, k, f = 2_449_152, 1_007_360, 5, 128
    if "--small" in sys.argv:  # CPU smoke test
        src, dst, k, f = 30_000, 10_000, 5, 32
    idx = jax.random.randint(jax.random.key(0), (dst, k), 0, src, jnp.int32)
    mask = jnp.ones((dst, k), jnp.float32)
    feat = jax.random.normal(jax.random.key(1), (src, f), jnp.float32)

    @jax.jit
    def out_deg_scatter(idx, mask):
        return (
            jnp.zeros((src,), jnp.float32)
            .at[idx.reshape(-1)]
            .add(mask.reshape(-1), mode="drop")
        )

    @jax.jit
    def table_scale(feat, deg):
        return feat * (1.0 / jnp.sqrt(jnp.maximum(deg, 1.0)))[:, None]

    from xgnn_tpu.ops.degree import pick_multiplicity

    @jax.jit
    def sort_counts(idx):
        cnt = pick_multiplicity(idx)
        return jax.lax.rsqrt(jnp.maximum(cnt.astype(jnp.float32), 1.0))

    deg = out_deg_scatter(idx, mask)
    t_scatter = timeit(out_deg_scatter, idx, mask)
    t_scale = timeit(table_scale, feat, deg)
    t_sort = timeit(sort_counts, idx)
    rows = [
        ("out_deg_scatter_5M_into_2.45M", t_scatter,
         f"{dst * k / t_scatter / 1e6:.0f}M elem/s"),
        ("src_scale_table_pass_2.45Mx128", t_scale,
         f"{src * f * 4 * 2 / t_scale / 1e9:.0f} GB/s rw"),
        ("sum_per_gcn_layer0_scatter_path", t_scatter + t_scale, ""),
        ("pick_multiplicity_sort_path_5M", t_sort,
         f"{dst * k / t_sort / 1e6:.0f}M elem/s"),
    ]
    for name, t, rate in rows:
        print(f"{name}\t{t*1e3:.2f} ms\t{rate}")
    if "--small" in sys.argv:  # smoke run: don't stomp the recorded chip tsv
        return
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gcn_deg_bench.tsv")
    with open(out, "w") as fh:
        fh.write("name\ttime_s\trate\n")
        for name, t, rate in rows:
            fh.write(f"{name}\t{t:.6f}\t{rate}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
