"""Row scatter-add: does index ordering matter on TPU?

The train step's biggest remaining line item is the inner-layer backward
scatter-add of pick gradients into the src activation table (~27 ms/step at
bench shapes, ~54 GB/s — PERF.md trace table).  A sort-based custom VJP
(sort picks by target, gather grads in sorted order, scatter with SORTED
indices) only pays off if a sorted-index scatter beats the random one by
more than the sort+gather cost (~12 ms).  This bench answers that.

Usage: python evaluation/microbench/scatter_bench.py [--small]
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
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(out)
    sync_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max(time.perf_counter() - t0 - sync_cost, 1e-9) / iters


def main():
    # bench layer-1 backward shape: 1.33M pick-grad rows into a 1M-src table
    n_src, n_pick, f = 1_007_360, 1_333_760, 256
    if "--small" in sys.argv:
        n_src, n_pick, f = 10_000, 13_000, 64
    kg, ki = jax.random.split(jax.random.key(0))
    g = jax.random.normal(kg, (n_pick, f), jnp.float32)
    idx = jax.random.randint(ki, (n_pick,), 0, n_src, jnp.int32)
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def scatter_rows(idx, g):
        return jnp.zeros((n_src, f), jnp.float32).at[idx].add(g)

    @jax.jit
    def sort_gather_scatter(idx, g):
        # the candidate VJP pipeline: sort by target, gather grads into
        # target order, scatter with sorted (maximally-adjacent) indices
        sid, order = jax.lax.sort((idx, jnp.arange(idx.shape[0], dtype=jnp.int32)), num_keys=1)
        gs = jnp.take(g, order, axis=0)
        return jnp.zeros((n_src, f), jnp.float32).at[sid].add(gs)

    bytes_rw = (n_pick * f + 2 * n_src * f) * 4
    rows = [
        ("scatter_random_idx", timeit(scatter_rows, idx, g)),
        ("scatter_sorted_idx", timeit(scatter_rows, idx_sorted, g)),
        ("sort_gather_scatter_e2e", timeit(sort_gather_scatter, idx, g)),
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scatter_bench.tsv")
    with open(out, "w") as fh:
        fh.write("name\ttime_s\trate\n")
        for name, t in rows:
            rate = f"{bytes_rw / t / 1e9:.0f} GB/s rw-equiv"
            print(f"{name}\t{t*1e3:.2f} ms\t{rate}")
            if "--small" not in sys.argv:
                fh.write(f"{name}\t{t:.6f}\t{rate}\n")
    if "--small" not in sys.argv:
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
