"""Batch sanity checks (opt-in).

Analog of the reference's assert kernels enabled by ``SAMGRAPH_SANITY_CHECK``
(``cuda/cuda_sanity_check.cu:30-70``, ``cpu/cpu_sanity_check.cc``): validate
that a sampled batch holds its invariants — unique frontier has no duplicates
or EMPTY leaks in the valid prefix, every neighbor local id addresses a valid
src entry, and padding regions are fully EMPTY.  One jitted pass returns a
violation bitmask; the engine raises on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from ..types import SampledBatch

EMPTY = C.EMPTY_KEY

VIOLATION_NAMES = (
    "input_duplicate",
    "input_empty_leak",
    "input_pad_dirty",
    "neigh_out_of_range",
    "neigh_pad_dirty",
)


@jax.jit
def check_batch(batch: SampledBatch) -> jax.Array:
    """Returns an int32 bitmask of violations (0 = clean)."""
    flags = jnp.zeros((), jnp.int32)
    ids = batch.input_nodes
    n = ids.shape[0]
    pos = jnp.arange(n)
    valid = pos < batch.num_input
    # duplicates within the valid prefix (sort-adjacent check)
    s = jnp.sort(jnp.where(valid, ids, EMPTY))
    dup = jnp.any((s[1:] == s[:-1]) & (s[1:] != EMPTY))
    flags = flags | (dup.astype(jnp.int32) << 0)
    # EMPTY leaked into the valid prefix
    flags = flags | (jnp.any(valid & (ids == EMPTY)).astype(jnp.int32) << 1)
    # padding region must be EMPTY
    flags = flags | (jnp.any(~valid & (ids != EMPTY)).astype(jnp.int32) << 2)
    for blk in batch.blocks:
        rows = jnp.arange(blk.dst_cap)[:, None]
        in_dst = rows < blk.num_dst
        neigh = blk.neigh
        bad_range = jnp.any(
            in_dst & (neigh != EMPTY) & ((neigh < 0) | (neigh >= blk.num_src))
        )
        flags = flags | (bad_range.astype(jnp.int32) << 3)
        pad_dirty = jnp.any(~in_dst & (neigh != EMPTY))
        flags = flags | (pad_dirty.astype(jnp.int32) << 4)
    return flags


def explain(flags: int) -> list[str]:
    return [name for i, name in enumerate(VIOLATION_NAMES) if flags & (1 << i)]
