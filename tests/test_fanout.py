"""fanout_reduce_tiled matches the naive unrolled loop — values and grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgnn_tpu import constants as C
from xgnn_tpu.ops.fanout import fanout_reduce_tiled

EMPTY = C.EMPTY_KEY


def _naive(h_src, neigh, weights=None):
    dst, k = neigh.shape
    acc = jnp.zeros((dst, h_src.shape[1]), h_src.dtype)
    den = jnp.zeros((dst, 1), h_src.dtype)
    for j in range(k):
        col = neigh[:, j]
        m = (col != EMPTY).astype(h_src.dtype)[:, None]
        if weights is not None:
            m = m * weights[:, j].astype(h_src.dtype)[:, None]
        rows = jnp.take(h_src, jnp.where(col != EMPTY, col, 0), axis=0,
                        mode="clip")
        acc = acc + rows * m
        den = den + m
    return acc, den


def _data(seed, dst=300, k=7, src=500, f=24, holes=0.3):
    rng = np.random.default_rng(seed)
    neigh = rng.integers(0, src, (dst, k)).astype(np.int32)
    neigh[rng.random((dst, k)) < holes] = EMPTY
    h = rng.normal(size=(src, f)).astype(np.float32)
    w = rng.random((dst, k)).astype(np.float32)
    return jnp.asarray(h), jnp.asarray(neigh), jnp.asarray(w)


@pytest.mark.parametrize("tile", [64, 100, 512])
@pytest.mark.parametrize("weighted", [False, True])
def test_forward_matches(tile, weighted):
    h, neigh, w = _data(0)
    w = w if weighted else None
    s0, d0 = _naive(h, neigh, w)
    s1, d1 = fanout_reduce_tiled(h, neigh, w, tile)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-6)


@pytest.mark.parametrize("weighted", [False, True])
def test_grads_match(weighted):
    h, neigh, w = _data(1, dst=150, k=5, src=200, f=16)
    w = w if weighted else None

    def loss_naive(h, w):
        s, d = _naive(h, neigh, w)
        return jnp.sum(jnp.sin(s) * 0.1 + d * 0.01)

    def loss_tiled(h, w):
        s, d = fanout_reduce_tiled(h, neigh, w, 64)
        return jnp.sum(jnp.sin(s) * 0.1 + d * 0.01)

    if weighted:
        g0 = jax.grad(loss_naive, argnums=(0, 1))(h, w)
        g1 = jax.grad(loss_tiled, argnums=(0, 1))(h, w)
        for a, b in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    else:
        g0 = jax.grad(loss_naive)(h, None)
        g1 = jax.grad(loss_tiled)(h, None)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-5)


def test_jit_and_empty_rows():
    h, neigh, w = _data(2, dst=64, k=3)
    neigh = neigh.at[5].set(EMPTY)  # fully-masked dst row
    f = jax.jit(lambda h, n: fanout_reduce_tiled(h, n, None, 32))
    s, d = f(h, neigh)
    assert float(d[5, 0]) == 0.0
    assert np.all(np.isfinite(np.asarray(s)))
