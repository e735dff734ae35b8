"""Kernel microbenchmarks on the real chip: feature-gather bandwidth (XLA vs
Pallas), frontier-dedup sort throughput, streamed fanout-reduce (SpMM-analog)
bandwidth — the speed-of-light checks from BASELINE.json.

Usage: python evaluation/microbench/run.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x):
    """Force full completion: a 4-byte D2H pull round-trips the device.

    (block_until_ready alone can return early through remote-tunnel
    transports, producing impossibly fast timings.)"""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    # baseline: sync-only cost (tunnel latency), measured around zero work
    t0 = time.perf_counter()
    _sync(out)
    sync_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - sync_cost), 1e-9) / iters


def main():
    import xgnn_tpu  # noqa: F401  (enables compile cache)
    from xgnn_tpu.ops.pallas_gather import gather_rows_pallas
    from xgnn_tpu.ops.unique import unique_seeded

    n, f, b = 2_000_000, 128, 1_000_000
    key = jax.random.key(0)
    feat = jax.random.normal(key, (n, f), jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (b,), 0, n, jnp.int32)
    bytes_moved = b * f * 4 * 2  # read + write

    t = timeit(jax.jit(lambda ft, i: jnp.take(ft, i, axis=0, mode="clip")), feat, ids)
    print(f"xla_gather: {t*1e3:.2f} ms  {bytes_moved/t/1e9:.1f} GB/s")

    if jax.default_backend() == "tpu":
        for r in (16, 32):
            try:
                t = timeit(lambda ft, i: gather_rows_pallas(ft, i, rows_per_step=r), feat, ids)
                print(f"pallas_gather r={r}: {t*1e3:.2f} ms  {bytes_moved/t/1e9:.1f} GB/s")
            except Exception as e:
                print(f"pallas_gather r={r}: FAILED {type(e).__name__}")

    # sampler cost isolation: big sort, scattered 4B gather, segment ops
    m8 = jax.random.randint(jax.random.key(7), (8_000_000,), 0, n, jnp.int32)
    t = timeit(jax.jit(jnp.sort), m8)
    print(f"sort 8M int32: {t*1e3:.2f} ms  {8e6/t/1e6:.0f} M/s")
    t = timeit(jax.jit(lambda x: jnp.argsort(x)), m8)
    print(f"argsort 8M int32: {t*1e3:.2f} ms  {8e6/t/1e6:.0f} M/s")

    edge_idx = jax.random.randint(jax.random.key(8), (1_000_000, 15), 0, 100_000_000, jnp.int32)
    big_edges = jax.random.randint(jax.random.key(9), (100_000_000,), 0, n, jnp.int32)
    t = timeit(jax.jit(lambda e, i: e[i]), big_edges, edge_idx)
    print(f"scattered 4B gather 15M elems: {t*1e3:.2f} ms  {15e6/t/1e6:.0f} M/s")

    # dedup throughput at sampler scale
    m = 8_000_000
    big = jax.random.randint(jax.random.key(2), (m,), 0, n, jnp.int32)
    t = timeit(
        jax.jit(lambda x: unique_seeded(x, jnp.int32(0), 1, 2_000_000)[1]), big
    )
    print(f"unique_seeded 8M ids: {t*1e3:.2f} ms  {m/t/1e6:.1f} M ids/s")

    # streamed fanout reduce (aggregation) bandwidth
    from xgnn_tpu.models.gnn import masked_mean_stream
    from xgnn_tpu.types import Block

    dst, k = 500_000, 15
    neigh = jax.random.randint(jax.random.key(3), (dst, k), 0, b, jnp.int32)
    blk = Block(neigh=neigh, num_dst=jnp.int32(dst), num_src=jnp.int32(b))
    h = jax.random.normal(jax.random.key(4), (b, 128), jnp.float32)
    t = timeit(jax.jit(lambda hh, bb: masked_mean_stream(hh, bb)), h, blk)
    agg_bytes = dst * k * 128 * 4 + dst * 128 * 4
    print(f"fanout_mean {dst}x{k}x128: {t*1e3:.2f} ms  {agg_bytes/t/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
