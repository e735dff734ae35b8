"""Hot-vertex cache rankings.

The reference's cache-policy family (``common.h:86-95``; rank files built by
``utility/data-process/toolkit/cache/cache_by_*.cc``; presample at
``dist/pre_sampler.cc``).  A ranking is a hottest-first array of node ids;
``cache_percentage`` takes its prefix.
"""

from __future__ import annotations

import numpy as np

from ..config import CachePolicy, RunConfig
from ..dataset import Dataset


def _rank_by_degree(ds: Dataset) -> np.ndarray:
    """cache_by_degree.cc: descending out-degree, random tie-break handled by
    the partition-cache ctor in the reference (cuda_cache_manager_host.cc:175)
    — we shuffle before the stable sort for the same effect."""
    rng = np.random.default_rng(0)
    perm = rng.permutation(ds.num_node)
    deg = ds.degrees
    order = perm[np.argsort(-deg[perm], kind="stable")]
    return order.astype(np.int32)


def _rank_by_heuristic(ds: Dataset) -> np.ndarray:
    """cache_by_heuristic.cc: train set, then its 1-hop frontier, then the
    rest by descending degree."""
    tier = np.full(ds.num_node, 2, np.int8)
    hop = np.unique(
        np.concatenate(
            [
                ds.indices[ds.indptr[v] : ds.indptr[v + 1]]
                for v in ds.train_set[: min(len(ds.train_set), 200_000)]
            ]
        )
        if len(ds.train_set)
        else np.empty(0, np.int32)
    )
    tier[hop] = 1
    tier[ds.train_set] = 0
    deg = ds.degrees
    order = np.lexsort((-deg, tier))
    return order.astype(np.int32)


def _rank_by_degree_hop(ds: Dataset) -> np.ndarray:
    """cache_by_degree_hop.cc: degree of node + summed neighbor degrees
    (2-hop reach proxy)."""
    deg = ds.degrees.astype(np.int64)
    # exact segment sums via prefix sums (reduceat mishandles zero-length
    # trailing segments: clipping its starts truncates the previous segment)
    if ds.num_edge == 0:
        nbr_deg = np.zeros(ds.num_node, np.int64)
    else:
        csum = np.concatenate(
            ([0], np.cumsum(deg[ds.indices], dtype=np.int64))
        )
        ip = ds.indptr.astype(np.int64)
        nbr_deg = csum[ip[1:]] - csum[ip[:-1]]
    score = deg + nbr_deg
    return np.argsort(-score, kind="stable").astype(np.int32)


def _rank_random(ds: Dataset) -> np.ndarray:
    rng = np.random.default_rng(1)
    return rng.permutation(ds.num_node).astype(np.int32)


def build_ranking(
    ds: Dataset, config: RunConfig, access_freq: np.ndarray | None = None
) -> np.ndarray:
    """Return a hottest-first node-id ranking for ``config.cache_policy``.

    ``access_freq`` (per-node access counts) must be provided for the
    presample / fake-optimal policies — produced by
    :func:`xgnn_tpu.store.presample.presample_ranking` or node-access logs.
    Pre-converted ranking files shipped with a dataset take precedence
    (reference loads ``cache_by_degree.bin`` etc. from disk).
    """
    policy = config.cache_policy
    file_key = {
        CachePolicy.DEGREE: "degree",
        CachePolicy.HEURISTIC: "heuristic",
        CachePolicy.DEGREE_HOP: "degree_hop",
        CachePolicy.FAKE_OPTIMAL: "fake_optimal",
        CachePolicy.RANDOM: "random",
    }.get(policy)
    if file_key and file_key in ds.cache_rankings:
        return np.asarray(ds.cache_rankings[file_key])

    if policy in (
        CachePolicy.PRE_SAMPLE,
        CachePolicy.PRE_SAMPLE_STATIC,
        CachePolicy.FAKE_OPTIMAL,
        CachePolicy.DYNAMIC,
    ):
        if access_freq is None:
            raise ValueError(f"{policy} ranking requires access frequencies")
        return np.argsort(-access_freq, kind="stable").astype(np.int32)
    if policy == CachePolicy.DEGREE:
        return _rank_by_degree(ds)
    if policy == CachePolicy.HEURISTIC:
        return _rank_by_heuristic(ds)
    if policy == CachePolicy.DEGREE_HOP:
        return _rank_by_degree_hop(ds)
    if policy == CachePolicy.RANDOM:
        return _rank_random(ds)
    raise NotImplementedError(policy)
