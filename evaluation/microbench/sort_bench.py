"""Dedup-sort strategy microbench on the real chip.

unique_seeded (the frontier dedup) is sort-bound at bench scale
(~55ms of a ~125ms sample for the last layer).  This measures the
building-block alternatives at that scale to pick the fastest formulation:

- 1-operand vs 2-operand vs 3-operand int32 lax.sort
- packed int64 single-key sort (id<<32 | pos)
- scatter-based compaction (the alternative to the 3rd sort)
- unique_seeded end-to-end

Usage: python evaluation/microbench/sort_bench.py [--n N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

if os.environ.get("XGNN_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # for the packed-i64 variant

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6_000_000)
    args = ap.parse_args()
    n = args.n

    import xgnn_tpu  # noqa: F401
    from xgnn_tpu.ops.unique import unique_seeded

    key = jax.random.key(0)
    ids = jax.random.randint(key, (n,), 0, 2_449_029, jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    val = jnp.ones((n,), jnp.int32)

    rows = []

    def rec(name, t, note=""):
        rows.append((name, t * 1e3, note))
        print(f"{name}\t{t*1e3:.2f} ms\t{note}", flush=True)

    rec("sort_1op", timeit(jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)), ids))
    rec("sort_2op", timeit(
        jax.jit(lambda x, p: jax.lax.sort((x, p), num_keys=1, is_stable=True)),
        ids, pos,
    ))
    rec("sort_3op", timeit(
        jax.jit(lambda x, p, v: jax.lax.sort((x, p, v), num_keys=1,
                                             is_stable=True)),
        ids, pos, val,
    ))

    def packed(x):
        k = x.astype(jnp.int64) << 32 | jnp.arange(
            x.shape[0], dtype=jnp.int64
        )
        s = jax.lax.sort((k,), num_keys=1)[0]
        return (s >> 32).astype(jnp.int32), (s & 0xFFFFFFFF).astype(jnp.int32)

    rec("sort_packed_i64", timeit(jax.jit(packed), ids))

    def scatter_compact(x, p):
        # compaction alternative: scatter n elements into a 2.5M table
        return jnp.zeros(2_449_152, jnp.int32).at[x].max(p, mode="drop")

    rec("scatter_compact", timeit(jax.jit(scatter_compact), ids, pos))

    perm = jax.random.permutation(jax.random.key(5), n).astype(jnp.int32)

    def scatter_perm(pm, v):
        # collision-free permutation scatter (the unsort alternative)
        return jnp.zeros(n, jnp.int32).at[pm].set(v)

    rec("scatter_permutation", timeit(jax.jit(scatter_perm), perm, pos))

    def gather_perm(pm, v):
        return v[pm]

    rec("gather_permutation", timeit(jax.jit(gather_perm), perm, pos))

    def argsort2(x):
        o = jnp.argsort(x, stable=True)
        return o

    rec("argsort", timeit(jax.jit(argsort2), ids))

    prev_cap = 1_007_360
    out_cap = 2_449_152
    nprev = jnp.asarray(400_000, jnp.int32)
    rec("unique_seeded_e2e", timeit(
        jax.jit(lambda i, np_: unique_seeded(i, np_, prev_cap, out_cap)),
        ids, nprev,
    ), f"n={n} out_cap={out_cap}")

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sort_bench.tsv"
    )
    with open(out, "w") as f:
        f.write("kernel\ttime_ms\tnotes\n")
        for s, t, note in rows:
            f.write(f"{s}\t{t:.3f}\t{note}\n")
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
