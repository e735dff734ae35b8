"""Sampling kernel tests: validity invariants + distribution-level checks.

The reference's sampling is nondeterministic, validated by opt-in sanity
kernels (SURVEY §4.3).  Here we check hard invariants exactly (every sampled
id is a true neighbor; without-replacement => no duplicates; full coverage at
low degree) and uniformity via chi-square-style frequency bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgnn_tpu import synthetic
from xgnn_tpu.constants import EMPTY_KEY
from xgnn_tpu.ops import sampling
from xgnn_tpu.ops.random_walk import sample_random_walk


@pytest.fixture(scope="module")
def g(small_ds):
    return (
        jnp.asarray(small_ds.indptr),
        jnp.asarray(small_ds.indices),
        small_ds,
    )


def _neighbors(ds, v):
    return set(ds.indices[ds.indptr[v] : ds.indptr[v + 1]].tolist())


def _check_validity(ds, frontier, nbr, require_no_dup=False):
    nbr = np.asarray(nbr)
    for i, v in enumerate(frontier):
        row = nbr[i]
        valid = row[row != EMPTY_KEY]
        if v == EMPTY_KEY:
            assert len(valid) == 0
            continue
        ns = _neighbors(ds, v)
        if len(ns) == 0:
            assert len(valid) == 0
            continue
        assert set(valid.tolist()) <= ns, f"non-neighbor sampled for {v}"
        if require_no_dup:
            assert len(set(valid.tolist())) == len(valid)


@pytest.mark.parametrize("fn_name,no_dup", [
    ("sample_khop0", True),
    ("sample_khop1", True),
    ("sample_khop2", True),
    ("sample_khop3", True),
    ("sample_uniform_wr", False),
])
def test_khop_validity(g, fn_name, no_dup):
    indptr, indices, ds = g
    fn = getattr(sampling, fn_name)
    frontier = np.arange(0, 128, dtype=np.int32)
    frontier[5] = EMPTY_KEY
    nbr = fn(indptr, indices, jnp.asarray(frontier), 7, jax.random.key(0))
    _check_validity(ds, frontier, nbr, require_no_dup=no_dup)


def test_khop0_full_coverage_low_degree():
    """d <= K must return every neighbor exactly once (reservoir contract)."""
    ds = synthetic.make_synthetic_dataset(
        num_node=50, avg_degree=3, feat_dim=4, num_class=2, seed=3,
        power_law=False, with_feat=False,
    )
    indptr, indices = jnp.asarray(ds.indptr), jnp.asarray(ds.indices)
    frontier = np.arange(50, dtype=np.int32)
    nbr = np.asarray(
        sampling.sample_khop0(indptr, indices, jnp.asarray(frontier), 16, jax.random.key(1))
    )
    for v in range(50):
        ns = ds.indices[ds.indptr[v] : ds.indptr[v + 1]].tolist()
        got = sorted(nbr[v][nbr[v] != EMPTY_KEY].tolist())
        if len(ns) <= 16:
            assert got == sorted(ns)


def test_khop0_uniformity():
    """Without-replacement picks must be uniform over the neighbor set."""
    # one hub node with 40 neighbors, sample K=5 many times
    indptr = jnp.asarray(np.array([0, 40], np.int32))
    indices = jnp.asarray(np.arange(100, 140, dtype=np.int32))
    frontier = jnp.zeros((256,), jnp.int32)  # 256 copies of node 0
    counts = np.zeros(40)
    for s in range(20):
        nbr = np.asarray(
            sampling.sample_khop0(indptr, indices, frontier, 5, jax.random.key(s))
        )
        ids, c = np.unique(nbr[nbr != EMPTY_KEY], return_counts=True)
        counts[ids - 100] += c
    total = counts.sum()
    expected = total / 40
    # each neighbor should be within 15% of the uniform expectation
    assert np.all(np.abs(counts - expected) < 0.15 * expected), counts


@pytest.mark.parametrize("fn_name", ["sample_khop2", "sample_khop3"])
def test_khop23_are_without_replacement(fn_name):
    """Reference khop2 (in-place Fisher-Yates, cuda_sampling_khop2.cu:78-92)
    and khop3 (draw-until-K-distinct, cuda_sampling_khop3.cu:126-137) both
    return exactly min(K, deg) DISTINCT picks — khop0's distribution, not
    with-replacement+dedup (which loses picks to birthday collisions)."""
    d, K = 12, 8
    indptr = jnp.asarray(np.array([0, d], np.int32))
    indices = jnp.asarray(np.arange(100, 100 + d, dtype=np.int32))
    frontier = jnp.zeros((512,), jnp.int32)
    fn = getattr(sampling, fn_name)
    nbr = np.asarray(fn(indptr, indices, frontier, K, jax.random.key(0)))
    cnt = (nbr != EMPTY_KEY).sum(axis=1)
    assert np.all(cnt == K)  # always exactly K distinct on a deg>K hub
    for row in nbr:
        row = row[row != EMPTY_KEY]
        assert len(set(row.tolist())) == len(row)
    # low degree: every neighbor exactly once
    d2 = 5
    indptr2 = jnp.asarray(np.array([0, d2], np.int32))
    nbr2 = np.asarray(
        fn(indptr2, indices, frontier, K, jax.random.key(1))
    )
    for row in nbr2:
        assert sorted(row[row != EMPTY_KEY].tolist()) == list(range(100, 105))


def test_weighted_hash_dedup_first_k_distinct():
    """Reference weighted hash-dedup draws alias picks until K DISTINCT
    (cuda_sampling_weighted_khop_hash_dedup.cu:98-108) and emits the full
    row when deg <= K (:85-95): picks must be distinct, usually exactly K,
    and follow the weights in aggregate."""
    d, K = 10, 4
    indptr = jnp.asarray(np.array([0, d], np.int32))
    indices = jnp.asarray(np.arange(100, 100 + d, dtype=np.int32))
    w = np.linspace(1.0, 4.0, d).astype(np.float32)
    # uniform-slot alias tables are overkill here: use prob=1 rows (always
    # take the slot draw) scaled so the slot draw itself is uniform, and
    # verify the distinct/low-degree contracts; weight-following is covered
    # by the alias test below via a real alias build
    prob = jnp.ones((d,), jnp.float32)
    alias = indices
    frontier = jnp.zeros((512,), jnp.int32)
    nbr = np.asarray(
        sampling.sample_weighted_khop_hash_dedup(
            indptr, indices, prob, alias, frontier, K, jax.random.key(0)
        )
    )
    cnt = (nbr != EMPTY_KEY).sum(axis=1)
    # 16 uniform draws over 10 values: K=4 distinct essentially always
    assert np.all(cnt == K), cnt
    for row in nbr:
        row = row[row != EMPTY_KEY]
        assert len(set(row.tolist())) == len(row)
        assert set(row.tolist()) <= set(range(100, 100 + d))
    # deg <= K: full row emitted
    d2 = 3
    indptr2 = jnp.asarray(np.array([0, d2], np.int32))
    nbr2 = np.asarray(
        sampling.sample_weighted_khop_hash_dedup(
            indptr2, indices, prob, alias, frontier, K, jax.random.key(1)
        )
    )
    for row in nbr2:
        assert sorted(row[row != EMPTY_KEY].tolist()) == [100, 101, 102]


def test_khop1_is_with_replacement_dedup_not_reservoir():
    """khop1 must match the reference pipeline (cuda_sampling_khop1.cu:
    independent with-replacement draws, then duplicate-pair compact) — NOT
    khop0's reservoir.  Distinguishing statistic: on a hub with deg > K,
    khop0 always returns exactly K distinct picks, while khop1's draws
    collide and return fewer with the birthday-problem expectation."""
    d, K = 12, 8
    indptr = jnp.asarray(np.array([0, d], np.int32))
    indices = jnp.asarray(np.arange(100, 100 + d, dtype=np.int32))
    frontier = jnp.zeros((512,), jnp.int32)
    n0 = np.asarray(
        sampling.sample_khop0(indptr, indices, frontier, K, jax.random.key(0))
    )
    n1 = np.asarray(
        sampling.sample_khop1(indptr, indices, frontier, K, jax.random.key(0))
    )
    c0 = (n0 != EMPTY_KEY).sum(axis=1)
    c1 = (n1 != EMPTY_KEY).sum(axis=1)
    assert np.all(c0 == K)  # reservoir: exactly K distinct
    # E[#distinct] = d*(1-(1-1/d)^K) ≈ 6.03 for d=12, K=8
    expect = d * (1 - (1 - 1 / d) ** K)
    assert abs(c1.mean() - expect) < 0.35, c1.mean()
    assert np.all(c1 <= K) and np.all(c1 >= 1)
    # valid picks are still uniform over the neighbor set
    ids, c = np.unique(n1[n1 != EMPTY_KEY], return_counts=True)
    assert set(ids.tolist()) <= set(range(100, 100 + d))
    frac = c / c.sum()
    assert np.all(np.abs(frac - 1 / d) < 0.25 / d), frac


def test_weighted_khop_follows_weights(small_ds):
    ds = synthetic.make_synthetic_dataset(
        num_node=2, avg_degree=1, feat_dim=4, num_class=2, seed=5,
        power_law=False, with_feat=False,
    )
    # hand-build: node 0 with 4 neighbors, weights [1, 1, 2, 4]
    ds.indptr = np.array([0, 4, 4], np.int32)
    ds.indices = np.array([10, 11, 12, 13], np.int32)[: 4]
    ds.num_node, ds.num_edge = 2, 4
    w = np.array([1.0, 1.0, 2.0, 4.0], np.float32)
    # alias construction via synthetic helper on a custom weight vector
    ds.prob_prefix_table = np.cumsum(w).astype(np.float32)
    d = 4
    p = w * d / w.sum()
    # simple alias build — alias entries are GLOBAL node ids, matching the
    # reference binary format (create_alias_table.cc:152)
    prob = p.copy(); alias = ds.indices.copy().astype(np.int64)
    small = [i for i in range(d) if p[i] < 1]; large = [i for i in range(d) if p[i] >= 1]
    while small and large:
        sm, lg = small.pop(), large.pop()
        alias[sm] = ds.indices[lg]; prob[lg] -= (1 - prob[sm])
        (small if prob[lg] < 1 else large).append(lg)
    for i in small + large:
        prob[i] = 1.0
    ds.prob_table, ds.alias_table = prob.astype(np.float32), alias.astype(np.int32)

    frontier = jnp.zeros((512,), jnp.int32)
    for fn in (
        lambda f, k: sampling.sample_weighted_khop(
            jnp.asarray(ds.indptr), jnp.asarray(ds.indices),
            jnp.asarray(ds.prob_table), jnp.asarray(ds.alias_table), f, 8, k),
        lambda f, k: sampling.sample_weighted_khop_prefix(
            jnp.asarray(ds.indptr), jnp.asarray(ds.indices),
            jnp.asarray(ds.prob_prefix_table), f, 8, k),
    ):
        counts = np.zeros(4)
        for s in range(10):
            nbr = np.asarray(fn(frontier, jax.random.key(s)))
            ids, c = np.unique(nbr[nbr != EMPTY_KEY], return_counts=True)
            counts[ids - 10] += c
        frac = counts / counts.sum()
        np.testing.assert_allclose(frac, w / w.sum(), atol=0.02)


def test_random_walk_topk(g):
    indptr, indices, ds = g
    frontier = jnp.asarray(np.arange(64, dtype=np.int32))
    neigh, weights, _ = sample_random_walk(
        indptr, indices, frontier, 5, jax.random.key(0),
        num_random_walk=8, random_walk_length=3, restart_prob=0.5,
    )
    neigh, weights = np.asarray(neigh), np.asarray(weights)
    assert neigh.shape == (64, 5)
    for i in range(64):
        row = neigh[i][neigh[i] != EMPTY_KEY]
        # distinct, and never the seed itself
        assert len(set(row.tolist())) == len(row)
        assert i not in row
        # weights positive exactly on valid entries, non-increasing
        wrow = weights[i][neigh[i] != EMPTY_KEY]
        assert np.all(wrow > 0)
        assert np.all(np.diff(weights[i]) <= 1e-6)


def test_pallas_gather_interpret():
    """Pallas gather kernel correctness (interpreter mode on CPU)."""
    from xgnn_tpu.ops.pallas_gather import gather_rows_pallas

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((200, 128)).astype(np.float32))
    ids = rng.integers(0, 200, 64).astype(np.int32)
    ids[5] = EMPTY_KEY
    out = np.asarray(
        gather_rows_pallas(feat, jnp.asarray(ids), rows_per_step=16,
                           interpret=True)
    )
    for i, v in enumerate(ids):
        if v == EMPTY_KEY:
            np.testing.assert_array_equal(out[i], 0)
        else:
            np.testing.assert_allclose(out[i], np.asarray(feat)[v])


def test_weighted_prefix_coarse_matches_binary_search(small_ds):
    """The coarse-CDF path (build_coarse_cdf + tile-pair finish) returns
    BIT-IDENTICAL picks to the pure binary search for the same draws."""
    from xgnn_tpu import synthetic
    from xgnn_tpu.ops.sampling import (
        build_coarse_cdf,
        sample_weighted_khop_prefix,
    )
    from xgnn_tpu.ops.tiled import pad_tile

    synthetic.build_alias_tables(small_ds, seed=7)
    indptr = jnp.asarray(pad_tile(small_ds.indptr, fill=int(small_ds.indptr[-1])))
    indices = jnp.asarray(pad_tile(small_ds.indices))
    prefix = jnp.asarray(pad_tile(small_ds.prob_prefix_table))
    coarse = build_coarse_cdf(indptr, prefix, small_ds.num_node)
    max_deg = int(np.max(np.diff(small_ds.indptr)))

    frontier = jnp.asarray(
        np.random.default_rng(0).integers(0, small_ds.num_node, 257)
    ).astype(jnp.int32)
    frontier = frontier.at[13].set(EMPTY_KEY)  # masked entry
    for seed in range(3):
        key = jax.random.key(seed)
        ref = sample_weighted_khop_prefix(
            indptr, indices, prefix, frontier, 7, key, max_deg=max_deg
        )
        got = sample_weighted_khop_prefix(
            indptr, indices, prefix, frontier, 7, key, max_deg=max_deg,
            coarse_cdf=coarse,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
