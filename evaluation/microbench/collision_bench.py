"""Repeated-gather-index collision cost at the dist-graph path's shapes.

fetch_bench measured that repeated gather indices COLLIDE on this chip
(pointing 80% of picks at one shared dummy row made the gather 2.7x slower
than fully random).  The partitioned-store path does exactly that on every
padded slot today:

  - ``exchange.partitioned_gather_indirect`` points every invalid request at
    LOCAL ROW 0 (``local_idx = where(req_valid, local_idx, 0)``);
  - ``sampling._frontier_meta`` maps every EMPTY frontier entry to NODE 0,
    so its indptr touches and all K of its pick gathers land in tile 0.

At bench shapes the padding fraction is 20-45% (1.25x exchange headroom plus
the frontier-cap slack), so the collision tax could explain much of the
owner-side gather running at ~37 GB/s vs the ~62 GB/s transaction floor
(VERDICT r3 weak #1).  This bench measures the fix candidates:

  row-gather cases (feature-exchange shape: (2.45M, 128) f32 table):
    all_valid       — B random ids (the no-padding floor)
    pad_row0_P      — P% suffix pointing at row 0 (TODAY's behavior)
    pad_spread_P    — P% suffix spread over distinct rows (iota % n)
  tile-gather cases (take_1d pick shape: 124M-element int32 edge array):
    picks_valid     — (B, K) positions from random row starts
    picks_row0_P    — P% of rows parked at position 0 (TODAY)
    picks_spread_P  — P% of rows parked at distinct tile-aligned positions

Usage: python evaluation/microbench/collision_bench.py
Appends to collision_bench.tsv.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from run import timeit  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "collision_bench.tsv")


def log(name, ms, gbs):
    line = f"{name}\t{ms:.1f}\t{gbs:.1f}"
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    import xgnn_tpu  # noqa: F401  (compile cache)

    n, f = 2_449_029, 128
    b = 3_061_287  # 1.25x the feature-fetch cap (the P=1 exchange shape)
    feat = jax.random.normal(jax.random.key(0), (n, f), jnp.float32)
    rng = np.random.default_rng(0)

    chunk = 1 << 20

    def gather_reduce(ft, ids):
        steps = -(-ids.shape[0] // chunk)
        pad = steps * chunk - ids.shape[0]
        ids = jnp.concatenate([ids, jnp.zeros(pad, ids.dtype)])

        def body(acc, i):
            sl = jax.lax.dynamic_slice_in_dim(ids, i * chunk, chunk)
            return acc + jnp.take(ft, sl, axis=0, mode="clip").sum(0), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((ft.shape[1],), ft.dtype), jnp.arange(steps)
        )
        return acc

    gr = jax.jit(gather_reduce)
    bytes_read = b * f * 4 / 1e9

    for frac in (0.0, 0.2, 0.45):
        n_pad = int(b * frac)
        ids_np = rng.integers(0, n, b).astype(np.int32)
        if n_pad:
            row0 = ids_np.copy()
            row0[-n_pad:] = 0
            spread = ids_np.copy()
            spread[-n_pad:] = np.arange(n_pad, dtype=np.int32) % n
            cases = [(f"pad_row0_{frac:g}", row0),
                     (f"pad_spread_{frac:g}", spread)]
        else:
            cases = [("all_valid", ids_np)]
        for name, arr in cases:
            ids = jnp.asarray(arr)
            dt = timeit(gr, feat, ids, iters=10)
            log(name, dt * 1e3, bytes_read / dt)

    # --- take_1d pick shape: (B, K) element positions in the edge array ---
    from xgnn_tpu.ops.tiled import TILE, take_1d

    ne = 124_000_000
    ne_pad = -(-ne // TILE) * TILE
    edges = jnp.asarray(
        rng.integers(0, n, ne_pad).astype(np.int32)
    )
    bk, k = 1_007_360, 10  # layer-2 frontier cap x fanout
    t1 = jax.jit(lambda a, p: take_1d(a, p).sum(dtype=jnp.int64))
    pick_bytes = bk * k * TILE * 4 / 1e9  # take_1d reads a full tile per pick

    starts = rng.integers(0, ne - 64, bk).astype(np.int32)
    offs = rng.integers(0, 16, (bk, k)).astype(np.int32)
    pos_valid = starts[:, None] + offs
    for frac in (0.0, 0.3):
        n_pad = int(bk * frac)
        if n_pad:
            row0 = pos_valid.copy()
            row0[-n_pad:] = 0
            spread = pos_valid.copy()
            spread[-n_pad:] = (
                (np.arange(n_pad, dtype=np.int64)[:, None] * TILE
                 + offs[-n_pad:]) % ne
            ).astype(np.int32)
            cases = [(f"picks_row0_{frac:g}", row0),
                     (f"picks_spread_{frac:g}", spread)]
        else:
            cases = [("picks_valid", pos_valid)]
        for name, arr in cases:
            pos = jnp.asarray(arr)
            dt = timeit(t1, edges, pos, iters=10)
            log(name, dt * 1e3, pick_bytes / dt)


if __name__ == "__main__":
    main()
