"""GAT contraction-form einsum formulations, fwd+bwd, at bench layer-0 shape.

The h8 trace shows the ``bkh,bki->bhi`` softmax-weighted-sum einsum's VJP
emitting an f32 (B,K,H) gradient in layout {2,1,0} followed by an ~6 ms
copy to {0,2,1} (PERF.md trace table).  This bench times algebraically
equivalent formulations fwd+bwd to see if any dodges the relayout.

Usage: python evaluation/microbench/gat_einsum_bench.py [--small]
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
    sync = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max(time.perf_counter() - t0 - sync, 1e-9) / iters


def main():
    b, k, h, i = 1_004_032, 5, 8, 128
    if "--small" in sys.argv:
        b = 10_000
    kr, ka = jax.random.split(jax.random.key(0))
    rows = jax.random.normal(kr, (b, k, i), jnp.bfloat16)
    e = jax.random.normal(ka, (b, k, h), jnp.float32)

    def run(fn):
        # fwd + bwd wrt the scores (the path that pays the relayout)
        g = jax.jit(jax.grad(lambda e: jnp.sum(fn(e) ** 2)))
        return timeit(g, e)

    def f_bhi(e):
        a = jax.nn.softmax(e, axis=1)
        return jnp.einsum("bkh,bki->bhi", a.astype(rows.dtype), rows,
                          preferred_element_type=jnp.float32)

    def f_bih(e):
        a = jax.nn.softmax(e, axis=1)
        return jnp.einsum("bki,bkh->bih", rows, a.astype(rows.dtype),
                          preferred_element_type=jnp.float32)

    def f_matmul(e):
        a = jax.nn.softmax(e, axis=1)  # (b,k,h)
        # batched matmul view: (b,h,k) @ (b,k,i)
        return jax.lax.dot_general(
            a.astype(rows.dtype), rows,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (b,h,i)

    for name, fn in [("einsum_bkh_bki_bhi", f_bhi),
                     ("einsum_bki_bkh_bih", f_bih),
                     ("dot_general_bhk_bki", f_matmul)]:
        t = timeit(jax.jit(jax.grad(lambda e, fn=fn: jnp.sum(fn(e) ** 2))), e)
        print(f"{name}\t{t*1e3:.2f} ms fwd+bwd")


if __name__ == "__main__":
    main()
