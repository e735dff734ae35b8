"""On-device synthetic graph generation (JAX).

Benchmark-scale graphs (100M+ edges) are generated directly in device HBM:
power-law endpoint draws, sort-based CSR construction, and feature synthesis
all run as XLA programs.  The host only receives the small arrays (train set,
labels).  This replaces host-side numpy generation, which is not viable for
benchmark scale on slow-CPU hosts (the reference leans on pre-converted
datasets on disk; we have no egress, so we synthesize).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .types import Graph


@dataclasses.dataclass
class DeviceDataset:
    """Device-resident analog of :class:`xgnn_tpu.dataset.Dataset` for
    benchmark graphs: topology + features stay in HBM, index sets on host."""

    name: str
    num_node: int
    num_edge: int
    feat_dim: int
    num_class: int
    graph: Graph
    feat: jax.Array  # (num_node, feat_dim) device
    label: jax.Array  # (num_node,) device int32
    train_set: np.ndarray
    valid_set: np.ndarray
    test_set: np.ndarray
    # weighted-sampling tables / rank files: not generated on device
    prob_table = None
    alias_table = None
    prob_prefix_table = None
    cache_rankings: dict = dataclasses.field(default_factory=dict)

    @property
    def indptr(self):  # Engine compatibility (rarely touched on host)
        return self.graph.indptr

    @property
    def degrees(self):
        return jnp.diff(self.graph.indptr)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _gen_edges(num_node: int, num_edge: int, alpha: float, key):
    """Power-law endpoint draws (same scheme as synthetic.powerlaw_edges)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    exp = 1.0 / (1.0 - alpha)

    def draw(k, kperm):
        u = jax.random.uniform(k, (num_edge,), jnp.float32, 1e-7, 1.0)
        ranks = jnp.minimum(
            (num_node * jnp.power(u, exp)).astype(jnp.int32), num_node - 1
        )
        perm = jax.random.permutation(kperm, num_node)
        return perm[ranks]

    src = draw(k1, k2)
    dst = draw(k3, k4)
    return src, dst


@partial(jax.jit, static_argnums=(2,))
def _build_csr_fast(src, dst, num_node: int):
    """COO → CSR without multi-edge dedup: ONE sort (by src).  Self loops
    removed via sentinel.  Used at benchmark scale where a few percent of
    multi-edges are statistically irrelevant and each 124M-element sort costs
    tens of seconds."""
    sentinel = jnp.iinfo(jnp.int32).max
    src = jnp.where(src == dst, sentinel, src)
    order = jnp.argsort(src)
    s, d = src[order], dst[order]
    valid = s != sentinel
    num_edge = jnp.sum(valid)
    s = jnp.where(valid, s, num_node - 1)
    counts = jnp.zeros(num_node, jnp.int32).at[s].add(
        valid.astype(jnp.int32), mode="drop"
    )
    indptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return indptr, jnp.where(valid, d, 0), num_edge


@partial(jax.jit, static_argnums=(2,))
def _build_csr(src, dst, num_node: int):
    """COO (with dups/self-loops) → deduplicated CSR, all on device.

    x64 is disabled, so edges are sorted as (src, dst) pairs via lexsort
    instead of a 64-bit key.  Self-loops get a sentinel src that sorts last
    and is excluded from the unique mask.
    """
    sentinel = jnp.iinfo(jnp.int32).max
    src = jnp.where(src == dst, sentinel, src)
    order = jnp.lexsort((dst, src))
    s, d = src[order], dst[order]
    uniq = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    ) & (s != sentinel)
    # stable compaction of unique edges to the front
    comp = jnp.argsort(~uniq, stable=True)
    us, ud = s[comp], d[comp]
    num_unique = jnp.sum(uniq)
    valid = jnp.arange(s.shape[0]) < num_unique
    us = jnp.where(valid, us, num_node - 1)
    ud = jnp.where(valid, ud, 0)
    counts = jnp.zeros(num_node, jnp.int32).at[us].add(
        valid.astype(jnp.int32), mode="drop"
    )
    indptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return indptr, ud, num_unique


@jax.jit
def _prefix_table(indptr, indices, key):
    """Row-local inclusive prefix sums of random positive edge weights — the
    on-device producer of the reference's ``prob_prefix_table.bin``
    (``utility/data-process/toolkit/weight/`` emits it offline;
    ``cuda_sampling_weighted_khop_prefix.cu`` consumes it).

    Segmented Hillis-Steele scan with row-boundary flags: sums never cross a
    row, so f32 stays exact-enough at any edge count (a single GLOBAL f32
    cumsum would lose the per-row differences beyond ~10^7 edges, and the
    f64 alternative SIGSEGVs this environment's remote AOT compiler).
    log2(E) elementwise levels, hand-rolled like ``ops.unique._forward_fill``
    (``lax.associative_scan`` at this length OOMs remote compilers).
    """
    e = indices.shape[0]
    w = jax.random.uniform(key, (e,), jnp.float32, 0.1, 1.0)
    v = w
    f = jnp.zeros((e,), jnp.bool_).at[indptr[:-1]].set(True, mode="drop")
    shift = 1
    while shift < e:
        pv = jnp.concatenate([jnp.zeros(shift, v.dtype), v[:-shift]])
        pf = jnp.concatenate([jnp.ones(shift, jnp.bool_), f[:-shift]])
        v = v + jnp.where(f, 0.0, pv)
        f = f | pf
        shift *= 2
    return v


def make_device_dataset(
    num_node: int,
    num_edge: int,
    feat_dim: int,
    num_class: int,
    train_frac: float = 0.08,
    seed: int = 0,
    alpha: float = 0.45,
    name: str = "synthetic_device",
    symmetric: bool = True,
    dedup: bool = True,
    weighted: bool = False,
) -> DeviceDataset:
    key = jax.random.key(seed)
    k_e, k_f, k_l, k_p = jax.random.split(key, 4)
    src, dst = _gen_edges(num_node, num_edge, alpha, k_e)
    if symmetric:
        s = jnp.concatenate([src, dst])
        d = jnp.concatenate([dst, src])
    else:
        s, d = src, dst
    build = _build_csr if dedup else _build_csr_fast
    indptr, indices, num_unique = build(s, d, num_node)
    # trim the padded tail on device, keeping tile alignment (ops/tiled.py)
    from .ops.tiled import TILE, pad_tile

    e = int(num_unique)
    indices = indices[: -(-e // TILE) * TILE]
    indptr = pad_tile(indptr, fill=e)

    feat = jax.random.normal(k_f, (num_node, feat_dim), jnp.float32)
    # label stays on device (D2H of N-sized arrays is expensive through the
    # tunnel); only the small node sets are pulled to host
    label = jax.random.randint(k_l, (num_node,), 0, num_class, jnp.int32)
    perm_dev = jax.random.permutation(k_p, num_node)
    n_train = max(1, int(num_node * train_frac))
    n_val = max(1, int(num_node * 0.02))
    perm = np.asarray(perm_dev[: n_train + 2 * n_val])
    prefix = (
        _prefix_table(indptr, indices, jax.random.fold_in(key, 7))
        if weighted
        else None
    )
    coarse = None
    if prefix is not None:
        from .ops.sampling import build_coarse_cdf

        coarse = build_coarse_cdf(indptr, prefix, num_node)
    max_deg = int(jnp.max(jnp.diff(indptr[: num_node + 1])))
    graph = Graph(
        indptr=indptr, indices=indices, prob_prefix_table=prefix,
        coarse_cdf=coarse, n_node=num_node, n_edge=e, n_max_deg=max_deg,
    )
    return DeviceDataset(
        name=name,
        num_node=num_node,
        num_edge=e,
        feat_dim=feat_dim,
        num_class=num_class,
        graph=graph,
        feat=feat,
        label=label,
        train_set=perm[:n_train].astype(np.int32),
        valid_set=perm[n_train : n_train + n_val].astype(np.int32),
        test_set=perm[n_train + n_val : n_train + 2 * n_val].astype(np.int32),
    )
