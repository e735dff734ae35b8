"""PinSAGE cost isolation: which dominates — the walk steps (W*L uniform
neighbor gathers per seed) or the O(M^2) visit counting (M = W*L)?

The round-2 verdict flagged the 10.07M vs 25.16M (khop3) gap with no
microbench attributing it.  This times the two phases of
``ops.random_walk.sample_random_walk`` separately at bench shapes:

- phase WALK: the L-step unrolled restart walk (indptr/indices tile gathers)
- phase COUNT: the (B, M, M) match-count + first-occurrence + top_k

Usage: python evaluation/microbench/pinsage_bench.py [--small]
Appends to pinsage_bench.tsv.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=8000)
    ap.add_argument("--walks", type=int, default=4)
    ap.add_argument("--length", type=int, default=3)
    ap.add_argument("--fanout", type=int, default=15)
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from run import timeit  # evaluation/microbench/run.py helpers
    from xgnn_tpu.constants import EMPTY_KEY
    from xgnn_tpu.synthetic_device import make_device_dataset

    nodes, edges = (30_000, 300_000) if args.small else (
        2_449_029, 62_000_000
    )
    ds = make_device_dataset(nodes, edges, 16, 8, train_frac=0.08, seed=0,
                             name="pinsage_bench", dedup=False)
    g = ds.graph
    b, w, l = args.batch, args.walks, args.length
    frontier = jnp.asarray(
        np.random.default_rng(0).choice(nodes, b).astype(np.int32)
    )

    from xgnn_tpu.ops.random_walk import _uniform_step

    @jax.jit
    def walk_only(indptr, indices, frontier, key):
        seed2d = jnp.broadcast_to(frontier[:, None], (b, w))
        cur = seed2d
        visits = []
        for step in range(l):
            key, k_step, k_restart = jax.random.split(key, 3)
            if step > 0:
                restart = jax.random.uniform(k_restart, (b, w)) < 0.5
                cur = jnp.where(restart, seed2d, cur)
            nxt = _uniform_step(indptr, indices, cur, k_step)
            visits.append(nxt)
            cur = jnp.where(nxt == EMPTY_KEY, seed2d, nxt)
        return jnp.stack(visits, axis=2).reshape(b, w * l)

    @jax.jit
    def count_only(v, frontier):
        v = jnp.where(v == frontier[:, None], EMPTY_KEY, v)
        eq = v[:, :, None] == v[:, None, :]
        counts = jnp.sum(eq, axis=2).astype(jnp.int32)
        m = v.shape[1]
        tri = jnp.tril(jnp.ones((m, m), jnp.bool_), k=-1)
        seen_before = jnp.any(eq & tri[None, :, :], axis=2)
        is_first = (~seen_before) & (v != EMPTY_KEY)
        score = jnp.where(is_first, counts, -1)
        top_score, top_idx = jax.lax.top_k(score, min(args.fanout, m))
        neigh = jnp.take_along_axis(v, top_idx, axis=1)
        return jnp.where(top_score > 0, neigh, EMPTY_KEY)

    key = jax.random.key(3)
    t_walk = timeit(walk_only, g.indptr, g.indices, frontier, key)
    v = walk_only(g.indptr, g.indices, frontier, key)
    t_count = timeit(count_only, v, frontier)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pinsage_bench.tsv")
    new = not os.path.isfile(out)
    with open(out, "a") as f:
        if new:
            f.write("# mode\tbatch\tW\tL\tM\twalk_ms\tcount_ms\tdominant\n")
        dom = "walk" if t_walk > t_count else "count"
        f.write(
            f"{'cpu' if args.small else 'tpu'}\t{b}\t{w}\t{l}\t{w*l}\t"
            f"{t_walk*1e3:.2f}\t{t_count*1e3:.2f}\t{dom}\n"
        )
    print(f"test_result:pinsage:walk_ms={t_walk*1e3:.2f}")
    print(f"test_result:pinsage:count_ms={t_count*1e3:.2f}")
    print(f"# appended to {out}")


if __name__ == "__main__":
    main()
