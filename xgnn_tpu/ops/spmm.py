"""Full-graph sparse aggregation (SpMM) over CSR.

The reference's full-graph path runs cusparse COO SpMM
(``sam_backend/scattergather.cu:48-112``); DGL uses the same for its
baselines.  On TPU, an (E, F) edge-feature materialization is not viable at
100M+ edges, so the SpMM streams over edge chunks: each ``lax.scan`` step
gathers a chunk of neighbor rows and scatter-adds into the node accumulator.
Chunk size trades VMEM pressure for scan length; every op in the loop is a
gather + scatter-add that XLA pipelines against HBM.

Used by full-neighbor layer-wise inference (``xgnn_tpu.inference``) — the
training path never materializes full-graph products (it aggregates over
sampled fanouts instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_node", "chunk", "mean"))
def spmm_csr(
    indptr: jax.Array,
    indices: jax.Array,
    h: jax.Array,
    *,
    num_node: int,
    chunk: int = 1 << 20,
    mean: bool = False,
) -> jax.Array:
    """out[v] = sum/mean over neighbors u of h[u] (CSR rows = v)."""
    num_edge = indices.shape[0]
    f = h.shape[1]
    # row id per edge: searchsorted over indptr, computed chunk-wise
    num_chunks = -(-num_edge // chunk)
    pad = num_chunks * chunk - num_edge
    idx_pad = jnp.concatenate([indices, jnp.zeros(pad, indices.dtype)])
    epos = jnp.arange(num_chunks * chunk, dtype=jnp.int32).reshape(
        num_chunks, chunk
    )
    idx_chunks = idx_pad.reshape(num_chunks, chunk)

    def body(acc, inputs):
        eids, nbrs = inputs
        rows = (
            jnp.searchsorted(indptr, eids, side="right").astype(jnp.int32) - 1
        )
        valid = eids < num_edge
        vals = jnp.take(h, nbrs, axis=0, mode="clip")
        vals = vals * valid[:, None].astype(h.dtype)
        acc = acc.at[jnp.where(valid, rows, num_node)].add(vals, mode="drop")
        return acc, None

    acc = jnp.zeros((num_node, f), h.dtype)
    acc, _ = jax.lax.scan(body, acc, (epos, idx_chunks))
    if mean:
        deg = (indptr[1:] - indptr[:-1]).astype(h.dtype)
        acc = acc / jnp.maximum(deg, 1.0)[:, None]
    return acc
