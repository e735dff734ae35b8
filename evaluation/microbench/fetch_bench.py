"""Neighbor-fetch strategy microbench on the real chip.

The khop samplers fetch one lane-aligned 128-wide TILE per edge pick
(``ops/tiled.take_1d``): B*K row gathers of 512 B each.  All K picks of a
node with degree <= 128 land in at most TWO adjacent tiles, so a
"tile-pair per node" fetch could cut gather traffic ~K/2x on the
low-degree mass of a power-law frontier.  Viability hinges on three
primitive rates this script measures:

1. random row gather (B*K rows)             -- the current cost
2. row gather with 80% repeated indices     -- does HBM coalesce repeats?
   (the hybrid leaves big-degree picks as per-pick gathers and points
   small-degree picks at a shared dummy row)
3. tile-pair gather (2 rows/node) + lane pick from (B, 256)
   via one-hot select                       -- the candidate small path
4. take_along_axis (B, 256) -> (B, K)       -- the obvious lane pick,
   usually slow on TPU (dynamic minor-dim indexing)

Usage: python evaluation/microbench/fetch_bench.py [--b B] [--k K]
Appends results to fetch_bench.tsv.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1_000_000, help="frontier nodes")
    ap.add_argument("--k", type=int, default=5, help="fanout")
    ap.add_argument("--edges", type=int, default=124_000_000)
    args = ap.parse_args()
    B, K = args.b, args.k
    n_tiles = args.edges // 128

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # the edge array, viewed as tiles
    tiles = jax.random.randint(
        k1, (n_tiles, 128), 0, 1 << 30, dtype=jnp.int32
    )
    rows_rand = jax.random.randint(k2, (B * K,), 0, n_tiles, jnp.int32)
    # 80% of picks redirected to one shared row (the hybrid's dummy slot)
    coin = jax.random.uniform(k3, (B * K,)) < 0.8
    rows_mixed = jnp.where(coin, 0, rows_rand)
    # tile-pair: 2 adjacent rows per node
    node_rows = jax.random.randint(k2, (B,), 0, n_tiles - 1, jnp.int32)
    lanes = jax.random.randint(k3, (B, K), 0, 256, jnp.int32)

    # tiles is a jit ARGUMENT everywhere: a closure-captured 0.5 GB array
    # would be shipped inside the remote-compile request (HTTP 413)
    @jax.jit
    def gather_rows(tiles, rows):
        return tiles[rows]

    @jax.jit
    def tile_pair_pick(tiles, node_rows, lanes):
        pair = jnp.concatenate(
            [tiles[node_rows], tiles[node_rows + 1]], axis=1
        )  # (B, 256)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
        onehot = lane_iota == lanes[:, :, None]  # (B, K, 256)
        return jnp.sum(
            jnp.where(onehot, pair[:, None, :], 0), axis=2, dtype=jnp.int32
        )

    @jax.jit
    def tile_pair_taa(tiles, node_rows, lanes):
        pair = jnp.concatenate(
            [tiles[node_rows], tiles[node_rows + 1]], axis=1
        )
        return jnp.take_along_axis(pair, lanes, axis=1)

    results = []
    t = timeit(gather_rows, tiles, rows_rand)
    gb = B * K * 512 / 1e9
    results.append(("row_gather_random", t, f"{gb/t:.0f} GB/s"))
    t = timeit(gather_rows, tiles, rows_mixed)
    results.append(("row_gather_80pct_repeat", t, f"{gb/t:.0f} GB/s-equiv"))
    t = timeit(tile_pair_pick, tiles, node_rows, lanes)
    gb2 = B * 2 * 512 / 1e9
    results.append(("tile_pair_onehot_pick", t, f"{gb2/t:.0f} GB/s"))
    t = timeit(tile_pair_taa, tiles, node_rows, lanes)
    results.append(("tile_pair_take_along_axis", t, f"{gb2/t:.0f} GB/s"))

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fetch_bench.tsv"
    )
    new = not os.path.isfile(out)
    with open(out, "a") as f:
        if new:
            f.write("# variant\tB\tK\ttime_ms\trate\n")
        for name, t, rate in results:
            f.write(f"{name}\t{B}\t{K}\t{t*1e3:.2f}\t{rate}\n")
            print(f"{name:30s} {t*1e3:8.2f} ms  {rate}")
    print(f"# appended to {out}")


if __name__ == "__main__":
    main()
