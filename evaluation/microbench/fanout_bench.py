"""A/B the fanout-aggregation formulations on the real chip.

Variants, forward-only and grad (fwd+bwd), float32 and bf16-stored sources:

  loop   — unrolled K row-gathers with an HBM accumulator (round-1 production
           path, ``models/gnn.py:fanout_reduce``): K reads + K read+write
           accumulator passes.
  tiled  — ``ops/fanout.fanout_reduce_tiled``: lax.scan over dst tiles,
           (tile, K, F) slab reduced on-chip, output written once; custom VJP
           scatter-adds into a carried (src, F) buffer.
  mater  — one (dst, K, F) materializing gather + sum (XLA fusion probe).

Shapes follow the bench step's dominant layer: dst 1M, K 5, F 128 from a
2.45M-row table, plus the microbench's historical 500k x 15 shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from xgnn_tpu import constants as C  # noqa: E402
from xgnn_tpu.ops.fanout import fanout_reduce_tiled  # noqa: E402

EMPTY = C.EMPTY_KEY


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
    return max(time.perf_counter() - t0 - sync_cost, 1e-9) / iters


def loop_reduce(h_src, neigh):
    dst, k = neigh.shape
    acc = jnp.zeros((dst, h_src.shape[1]), h_src.dtype)
    den = jnp.zeros((dst, 1), h_src.dtype)
    for j in range(k):
        col = neigh[:, j]
        m = (col != EMPTY).astype(h_src.dtype)[:, None]
        rows = jnp.take(h_src, jnp.where(col != EMPTY, col, 0), axis=0,
                        mode="clip")
        acc = acc + rows * m
        den = den + m
    return acc, den


def tree_reduce(h_src, neigh):
    """Same math as loop_reduce but as a balanced add-tree of K gather
    terms — no sequential accumulator dependence chain, so XLA may fuse
    all K gathers into ONE kernel (one output write instead of K
    accumulator round-trips)."""
    dst, k = neigh.shape
    terms, dens = [], []
    for j in range(k):
        col = neigh[:, j]
        m = (col != EMPTY).astype(h_src.dtype)[:, None]
        rows = jnp.take(h_src, jnp.where(col != EMPTY, col, 0), axis=0,
                        mode="clip")
        terms.append(rows * m)
        dens.append(m)
    while len(terms) > 1:
        odd_t = [terms[-1]] if len(terms) % 2 else []
        odd_d = [dens[-1]] if len(dens) % 2 else []
        terms = [a + b for a, b in zip(terms[::2], terms[1::2])] + odd_t
        dens = [a + b for a, b in zip(dens[::2], dens[1::2])] + odd_d
    return terms[0], dens[0]


def mater_reduce(h_src, neigh):
    m = neigh != EMPTY
    idx = jnp.where(m, neigh, 0)
    rows = jnp.take(h_src, idx, axis=0, mode="clip")  # (dst, K, F)
    mf = m.astype(h_src.dtype)[..., None]
    return jnp.sum(rows * mf, axis=1), jnp.sum(mf, axis=1)


def run_shape(dst, k, src, f=128, tile=2048):
    print(f"--- dst={dst} K={k} src={src} F={f}")
    neigh = jax.random.randint(jax.random.key(1), (dst, k), 0, src, jnp.int32)
    gather_gb = dst * k * f * 4 / 1e9  # f32 read bytes of the gather alone
    rows = []
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        h = jax.random.normal(jax.random.key(0), (src, f), dt)
        scale = 0.5 if dt == jnp.bfloat16 else 1.0
        for name, fn in (
            ("loop", loop_reduce),
            ("tree", tree_reduce),
            ("tiled", lambda h, n: fanout_reduce_tiled(h, n, None, tile)),
            ("mater", mater_reduce),
        ):
            jf = jax.jit(fn)
            t = timeit(jf, h, neigh)
            print(f"{name}_{tag} fwd: {t*1e3:7.2f} ms  "
                  f"{gather_gb*scale/t:6.1f} GB/s-gather")
            rows.append((f"{name}_{tag}_fwd_dst{dst}_k{k}", t * 1e3))

            def loss(h, n, fn=fn):
                s, d = fn(h, n)
                return jnp.sum(s.astype(jnp.float32)) + jnp.sum(
                    d.astype(jnp.float32))

            jg = jax.jit(jax.grad(loss))
            t = timeit(jg, h, neigh)
            print(f"{name}_{tag} f+b: {t*1e3:7.2f} ms")
            rows.append((f"{name}_{tag}_fb_dst{dst}_k{k}", t * 1e3))
    return rows


def main():
    import xgnn_tpu  # noqa: F401
    out = []
    out += run_shape(1_000_000, 5, 2_450_000)
    out += run_shape(500_000, 15, 2_000_000)
    path = os.path.join(os.path.dirname(__file__), "fanout_bench.tsv")
    with open(path, "w") as fh:
        fh.write("kernel\ttime_ms\n")
        for name, ms in out:
            fh.write(f"{name}\t{ms:.3f}\n")
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
