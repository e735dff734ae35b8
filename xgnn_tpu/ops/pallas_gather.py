"""Pallas feature-gather kernel: out[i, :] = feat[ids[i], :].

TPU-native analog of the reference's ``GPUExtract`` gather kernel
(``cuda/cuda_extraction.cu:35-100``), which is the hot op of feature
extraction.  XLA's dynamic gather on TPU materializes through generic
scatter/gather machinery; this kernel instead streams rows HBM→VMEM→HBM with
explicitly pipelined per-row DMAs driven by scalar-prefetched indices —
the pattern embedding lookups use to reach HBM speed-of-light.

Negative / EMPTY ids produce zero rows (mask applied on the output block).
Falls back to ``jnp.take`` on CPU (interpret mode is only used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

EMPTY = C.EMPTY_KEY


def _gather_kernel(rows_per_step: int, ids_ref, feat_hbm, out_ref, sems):
    """One grid step gathers ``rows_per_step`` rows into the output block.

    ``ids_ref`` is the scalar-prefetched id vector for this CHUNK (the outer
    wrapper splits huge id vectors into chunks so prefetch fits SMEM)."""
    step = pl.program_id(0)
    base = step * rows_per_step
    # start all row DMAs (feat HBM -> out VMEM block), then wait
    for j in range(rows_per_step):
        rid = ids_ref[base + j]
        safe = jnp.where((rid == EMPTY) | (rid < 0), 0, rid)
        pltpu.make_async_copy(
            feat_hbm.at[safe], out_ref.at[j], sems.at[j]
        ).start()
    for j in range(rows_per_step):
        rid = ids_ref[base + j]
        safe = jnp.where((rid == EMPTY) | (rid < 0), 0, rid)
        pltpu.make_async_copy(
            feat_hbm.at[safe], out_ref.at[j], sems.at[j]
        ).wait()
    # zero out invalid rows
    for j in range(rows_per_step):
        rid = ids_ref[base + j]

        @pl.when((rid == EMPTY) | (rid < 0))
        def _():
            out_ref[j, :] = jnp.zeros_like(out_ref[j, :])


@functools.partial(jax.jit, static_argnames=("rows_per_step", "interpret"))
def gather_rows_pallas(
    feat: jax.Array,
    ids: jax.Array,
    rows_per_step: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Gather ``feat[ids]`` with a Pallas DMA pipeline.

    ``ids`` length must be a multiple of ``rows_per_step`` (pad with EMPTY).
    """
    b = ids.shape[0]
    f = feat.shape[1]
    assert b % rows_per_step == 0, (b, rows_per_step)

    # chunk so the scalar-prefetched id vector fits comfortably in SMEM
    chunk = 65536
    if b <= chunk:
        chunks = [ids]
    else:
        assert b % chunk == 0 or True
        pad = (-b) % chunk
        if pad:
            ids = jnp.concatenate([ids, jnp.full(pad, EMPTY, ids.dtype)])
        chunks = [ids[i * chunk : (i + 1) * chunk] for i in range(len(ids) // chunk)]

    def one(c):
        grid = (c.shape[0] // rows_per_step,)
        return pl.pallas_call(
            functools.partial(_gather_kernel, rows_per_step),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (rows_per_step, f),
                    lambda i, ids_ref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA((rows_per_step,))],
            ),
            out_shape=jax.ShapeDtypeStruct((c.shape[0], f), feat.dtype),
            interpret=interpret,
        )(c, feat)

    out = jnp.concatenate([one(c) for c in chunks], axis=0)
    return out[:b]


def gather_rows(feat: jax.Array, ids: jax.Array, valid_mask=None) -> jax.Array:
    """Dispatch: Pallas on TPU, XLA take elsewhere."""
    if jax.default_backend() == "tpu":
        pad = (-len(ids)) % 16
        if pad:
            ids = jnp.concatenate([ids, jnp.full(pad, EMPTY, ids.dtype)])
        out = gather_rows_pallas(feat, ids)
        return out[: len(ids) - pad] if pad else out
    safe = jnp.where((ids == EMPTY) | (ids < 0), 0, ids)
    out = jnp.take(feat, safe, axis=0, mode="clip")
    return out * ((ids != EMPTY) & (ids >= 0))[:, None].astype(out.dtype)
