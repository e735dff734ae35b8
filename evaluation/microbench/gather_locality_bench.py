"""Random-row gather rate vs. working-set locality.

The spmm_bench control put this chip's f32 512B-row random gather at
48.7 GB/s for FULL-TABLE working sets (2.45M rows), while smaller tables
measured 230-257 GB/s.  If the rate is a function of the id *locality*
(HBM row-buffer / page behavior) rather than the table allocation size,
then reordering the planned SpMM's tasks by source-id block at PLAN time
(free, host-side, once per graph) recovers the fast rate with zero extra
device work — CSR adjacency is sorted per node, so each node's run splits
into contiguous subruns per source block and the existing bucket kernels
apply unchanged.

Cases, all gathering B rows from the same (N, 128) f32 table:
  full_random    — ids uniform over [0, N)            (the 48.7 baseline)
  window_W       — ids uniform over a W-row window    (upper bound for tiling)
  blocksorted_W  — uniform ids stably grouped by id//W, random within
                   (EXACTLY the access stream the tiled plan produces)
  sorted         — fully sorted ids (sweep; upper bound of blocksorted)

Usage: python evaluation/microbench/gather_locality_bench.py
Appends to gather_locality_bench.tsv.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from run import timeit  # noqa: E402


def main():
    n, f = 2_449_029, 128
    b = 4_000_000
    feat = jax.random.normal(jax.random.key(0), (n, f), jnp.float32)
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, n, b).astype(np.int32)
    bytes_read = b * f * 4  # reducing to (1, F) on-chip: reads dominate

    # scan over 1M-id chunks — the single flat 4M-row take hangs the remote
    # AOT compiler (>570 s); the chunked form matches the spmm_bench control
    chunk = 1 << 20

    @jax.jit
    def gather_reduce(ft, ids):
        steps = ids.shape[0] // chunk

        def body(acc, i):
            sl = jax.lax.dynamic_slice_in_dim(ids, i * chunk, chunk)
            return acc + jnp.take(ft, sl, axis=0, mode="clip").sum(0), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((ft.shape[1],), ft.dtype), jnp.arange(steps)
        )
        return acc

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gather_locality_bench.tsv")
    if not os.path.exists(out):
        with open(out, "a") as fh:
            fh.write("case\tms\tGBps\n")

    def rec(name, ids):
        t = timeit(gather_reduce, feat, jnp.asarray(ids), iters=5)
        gbps = bytes_read / t / 1e9
        print(
            f"test_result:gather_locality:{name}:ms={t*1e3:.1f}:"
            f"GBps={gbps:.1f}",
            flush=True,
        )
        with open(out, "a") as fh:  # append per case: partial runs survive
            fh.write(f"{name}\t{t*1e3:.1f}\t{gbps:.1f}\n")

    rec("full_random", ids_np)
    for w in (65_536, 262_144, 1_048_576):
        rec(f"window_{w}", (ids_np % w))
        blk = np.argsort(ids_np // w, kind="stable")
        rec(f"blocksorted_{w}", ids_np[blk])
    rec("sorted", np.sort(ids_np))


if __name__ == "__main__":
    main()
