"""Block-local degree counting without node-table scatters.

GCN's symmetric norm needs the block-local out-degree of every *picked*
neighbor (reference: DGL ``GraphConv(norm='both')`` over sampled blocks,
``example/samgraph/sgnn/train_gcn.py``).  The obvious formulation — a
scatter-count into a ``(src_cap,)`` table followed by a per-row scale of
``h_src`` — costs time proportional to the NODE table: the scatter runs at
~132M elem/s and the scale pass re-reads/writes the whole feature table,
which at small-batch shapes (where ``src_cap`` is the entire graph under
direct extract) dwarfs the per-edge work.

This module computes the same quantity *per pick*: the multiplicity of each
pick's id within the block's pick set, via two streaming ``lax.sort`` passes
(sorts run at ~490M keys/s, cost proportional to EDGES).  ``1/sqrt(count)``
then rides the existing ``weights`` input of ``fanout_reduce`` — no degree
table, no scatter, no full-table pass.  Measured A/B in
``evaluation/microbench/gcn_deg_bench.tsv`` / PERF.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from .unique import _forward_fill

EMPTY = C.EMPTY_KEY


def pick_multiplicity(neigh: jax.Array) -> jax.Array:
    """Multiplicity of each pick's id within the whole pick set.

    Args:
      neigh: int32 pick ids of any shape, ``EMPTY_KEY`` for invalid picks.

    Returns:
      Same-shape int32 counts: ``counts[i] = #{j : neigh[j] == neigh[i]}``
      over valid picks; 0 at invalid positions.

    Equivalent to ``bincount(neigh)[neigh]`` but scatter-free: sort the ids
    (EMPTY sorts last), take each run's length via forward/backward fills of
    the run-boundary indices, and unsort with a second permutation sort —
    both sorts stream at memory bandwidth (PERF.md primitive table).
    """
    shape = neigh.shape
    flat = neigh.reshape(-1)
    n = flat.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)

    sid, spos = jax.lax.sort((flat, pos), num_keys=1)
    boundary = sid[1:] != sid[:-1]
    is_first = jnp.concatenate([jnp.ones((1,), jnp.bool_), boundary])
    is_last = jnp.concatenate([boundary, jnp.ones((1,), jnp.bool_)])

    start = _forward_fill(jnp.where(is_first, pos, 0), is_first)
    end = _forward_fill(jnp.where(is_last, pos, 0)[::-1], is_last[::-1])[::-1]
    counts_sorted = jnp.where(sid != EMPTY, end - start + 1, 0)

    # unsort: sort by original position (a permutation => exact inverse)
    _, counts = jax.lax.sort((spos, counts_sorted), num_keys=1)
    return counts.reshape(shape)
