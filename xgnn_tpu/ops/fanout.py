"""Tiled masked fanout aggregation — the SpMM of the dense-block layout.

``fanout_reduce_tiled`` computes the same masked (weighted) neighbor sum as
the unrolled-K loop in ``models/gnn.py`` but tiles the dst axis with
``lax.scan``: each iteration gathers a small ``(tile, K, F)`` slab, reduces
it over K on-chip, and writes the ``(tile, F)`` result once.  The unrolled
loop instead re-reads and re-writes the full ``(dst, F)`` accumulator on
every one of the K passes — 3x the HBM traffic of the gather itself
(measured 114 GB/s effective vs 230 GB/s for a pure row gather on v5e).

The backward pass is hand-written (``jax.custom_vjp``): a scan over the same
tiles scatter-adding ``g_out[dst] * mask`` rows into a carried ``(src, F)``
gradient buffer — one in-place scatter-add per edge row, which is what XLA
emits for the unrolled loop too, minus the K accumulator round-trips.
(Letting autodiff differentiate the scan would instead accumulate a full
``(src, F)`` cotangent buffer pass per tile.)

Reference analog: the cusparse COO SpMM in ``sam_backend/scattergather.cu``
(forward :48-112, transpose-backward :114-184).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as C

EMPTY = C.EMPTY_KEY
_TILE = 2048


def _pad_rows(a: jax.Array, tile: int, fill) -> jax.Array:
    pad = (-a.shape[0]) % tile
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fanout_reduce_tiled(
    h_src: jax.Array,
    neigh: jax.Array,
    weights: Optional[jax.Array],
    tile: int = _TILE,
):
    """Masked (weighted) neighbor sum + denominator over the fanout axis.

    Args:
      h_src:  ``(src_cap, F)`` source features.
      neigh:  ``(dst_cap, K)`` int32 neighbor local ids, ``EMPTY_KEY`` = hole.
      weights: optional ``(dst_cap, K)`` per-edge weights (e.g. random-walk
        visit counts).  Gradients w.r.t. ``weights`` are supported (one extra
        re-gather pass in backward).

    Returns:
      ``(sum, denom)`` of shapes ``(dst_cap, F)`` and ``(dst_cap, 1)`` where
      ``denom = Σ mask`` (or ``Σ mask*weights``).
    """
    out, _ = _fwd(h_src, neigh, weights, tile)
    return out


def _fwd(h_src, neigh, weights, tile):
    dst_cap = neigh.shape[0]
    tile = min(tile, max(dst_cap, 1))
    neigh_t = _pad_rows(neigh, tile, EMPTY).reshape(-1, tile, neigh.shape[1])
    w_t = (
        _pad_rows(weights, tile, 0).reshape(neigh_t.shape)
        if weights is not None
        else None
    )

    # bf16-stored sources: gather reads bf16, accumulate in f32 (on-chip
    # cast of the gathered slab is free)
    acc_dt = (
        jnp.float32 if h_src.dtype == jnp.bfloat16 else h_src.dtype
    )

    # EMPTY picks spread over DISTINCT rows: one shared dummy row
    # serializes the transactions that hit it (collision_bench.tsv);
    # spread lanes are masked so values are unchanged
    n_rows = max(h_src.shape[0], 1)
    spread = (
        jax.lax.broadcasted_iota(jnp.int32, neigh_t.shape[1:], 0)
        * neigh.shape[1]
        + jax.lax.broadcasted_iota(jnp.int32, neigh_t.shape[1:], 1)
    ) % n_rows

    def body(_, inp):
        nb, w = inp
        m = nb != EMPTY
        mf = m.astype(acc_dt)
        if w is not None:
            mf = mf * w.astype(acc_dt)
        idx = jnp.where(m, nb, spread)
        rows = jnp.take(h_src, idx, axis=0, mode="clip")  # (tile, K, F)
        s = jnp.sum(rows.astype(acc_dt) * mf[..., None], axis=1)
        d = jnp.sum(mf, axis=1, keepdims=True)
        return None, (s, d)

    xs = (neigh_t, w_t) if w_t is not None else (neigh_t, None)
    if w_t is None:
        _, (s, d) = lax.scan(lambda c, nb: body(c, (nb, None)), None, neigh_t)
    else:
        _, (s, d) = lax.scan(body, None, xs)
    s = s.reshape(-1, h_src.shape[1])[:dst_cap]
    d = d.reshape(-1, 1)[:dst_cap]
    return (s, d), (h_src, neigh, weights)


def _bwd(tile, res, g):
    h_src, neigh, weights = res
    g_s, g_d = g
    dst_cap, k = neigh.shape
    tile = min(tile, max(dst_cap, 1))
    neigh_t = _pad_rows(neigh, tile, EMPTY).reshape(-1, tile, k)
    g_s_t = _pad_rows(g_s, tile, 0).reshape(-1, tile, g_s.shape[1])
    g_d_t = _pad_rows(g_d, tile, 0).reshape(-1, tile, 1)
    w_t = (
        _pad_rows(weights, tile, 0).reshape(-1, tile, k)
        if weights is not None
        else None
    )
    src_cap = h_src.shape[0]
    need_w_grad = weights is not None

    def body(carry, inp):
        g_h = carry
        nb, gs, gd, w = inp
        m = nb != EMPTY
        mf = m.astype(gs.dtype)
        if w is not None:
            mf = mf * w.astype(gs.dtype)
        # each contributing edge row receives the dst grad scaled by its
        # mask/weight (denom does not depend on h_src — only gs flows)
        upd = gs[:, None, :] * mf[..., None]  # (t, K, F)
        idx = jnp.where(m, nb, src_cap)  # out-of-range rows drop
        g_h = g_h.at[idx.reshape(-1)].add(
            upd.reshape(-1, upd.shape[-1]).astype(g_h.dtype), mode="drop"
        )
        if need_w_grad:
            spread = (
                jax.lax.broadcasted_iota(jnp.int32, nb.shape, 0) * k
                + jax.lax.broadcasted_iota(jnp.int32, nb.shape, 1)
            ) % max(src_cap, 1)
            rows = jnp.take(
                h_src, jnp.where(m, nb, spread), axis=0, mode="clip"
            )  # (t, K, F)
            gw = jnp.sum(rows * gs[:, None, :], axis=-1) + gd
            gw = gw * m.astype(gw.dtype)
        else:
            gw = None
        return g_h, gw

    g_h0 = jnp.zeros_like(h_src)
    xs = (neigh_t, g_s_t, g_d_t, w_t if w_t is not None else neigh_t)
    if need_w_grad:
        g_h, gw = lax.scan(body, g_h0, xs)
        g_w = gw.reshape(-1, k)[:dst_cap].astype(weights.dtype)
    else:
        g_h, _ = lax.scan(
            lambda c, i: (body(c, (i[0], i[1], i[2], None))[0], None),
            g_h0,
            (neigh_t, g_s_t, g_d_t),
        )
        g_w = None
    return g_h, None, g_w


fanout_reduce_tiled.defvjp(
    lambda h, n, w, tile: _fwd(h, n, w, tile),
    _bwd,
)
