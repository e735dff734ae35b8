"""Tile-aligned element gather.

XLA's dynamic gather on TPU issues one transaction per indexed ROW, so
gathering scattered 4-byte elements runs at the transaction rate (~80M/s on
v5e) regardless of bytes.  Fetching the lane-aligned 128-wide TILE containing
each element and selecting the lane with a one-hot mask+sum turns element
gathers into full-width row gathers — measured 2.5x faster at sampler scale
(32ms vs 81ms for 6.5M picks from a 124M-element edge array).  Zero memory
overhead: the tiled view is a reshape of the (tile-padded) flat array.

All CSR/edge-aligned arrays in this framework are padded to TILE with
:func:`pad_tile` at construction so kernels can call :func:`take_1d`
directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def pad_tile(arr, fill=0):
    """Pad a 1-D array (host numpy or device) to a multiple of TILE."""
    n = arr.shape[0]
    pad = (-n) % TILE
    if pad == 0:
        return arr
    if isinstance(arr, np.ndarray):
        return np.concatenate([arr, np.full(pad, fill, arr.dtype)])
    return jnp.concatenate([arr, jnp.full(pad, fill, arr.dtype)])


def take_1d(arr: jax.Array, pos) -> jax.Array:
    """``arr[pos]`` for a TILE-padded 1-D array; ``pos`` of any shape.

    Out-of-range positions clip to the last tile (callers mask results).
    """
    shape = pos.shape
    flat = pos.reshape(-1)
    if arr.shape[0] % TILE:  # unpadded caller (tests/tiny arrays): pad here
        arr = pad_tile(arr)
    tiled = arr.reshape(-1, TILE)
    rows = tiled[flat // TILE]  # row gather: full-bandwidth path
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        == (flat % TILE)[:, None]
    )
    out = jnp.sum(jnp.where(lane, rows, 0), axis=1, dtype=arr.dtype)
    return out.reshape(shape)


def take_runs(arr: jax.Array, starts: jax.Array, cap: int) -> jax.Array:
    """Gather CONTIGUOUS runs ``arr[starts[i] : starts[i] + cap]`` from a
    TILE-padded 1-D array — ``(n, cap)`` out.

    :func:`take_1d` fetches one full tile per POSITION (512 B to read a
    4-byte element) — right for scattered positions, 128x wasteful for
    runs.  A run of ``cap`` consecutive positions lies in
    ``cap//TILE + 1`` tiles: fetch those tile rows once per run and select
    each position's lane locally (``take_along_axis`` over the fetched
    lanes — on-chip shuffle, no extra HBM traffic).
    """
    n = starts.shape[0]
    if arr.shape[0] % TILE:
        arr = pad_tile(arr)
    tiled = arr.reshape(-1, TILE)
    # a run of cap elements starting at lane offset <=TILE-1 spans at
    # most (cap-1)//TILE + 2 tiles
    t = (cap - 1) // TILE + 2
    trow = starts // TILE
    rows = tiled[
        jnp.minimum(
            trow[:, None] + jnp.arange(t, dtype=starts.dtype)[None, :],
            tiled.shape[0] - 1,
        )
    ]  # (n, t, TILE)
    flat = rows.reshape(n, t * TILE)
    off = (starts % TILE)[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(flat, off, axis=1)
