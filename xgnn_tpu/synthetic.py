"""Synthetic graph generation (dataset fixtures + benchmark graphs).

The reference has no mock backend — its closest fixture is synthetic features
(``--empty-feat``, engine.cc:198-235).  For an egress-free TPU environment we
additionally generate whole synthetic graphs: small uniform random graphs for
unit tests and RMAT power-law graphs at ogbn-products scale for benchmarks
(same role as the reference's ``datagen`` converted datasets).
"""

from __future__ import annotations

import numpy as np

from .dataset import Dataset


def _coo_to_csr(src, dst, num_node):
    """Sort-based COO→CSR with multi-edge dedup (simple graph, like the
    reference's converted datasets)."""
    eid = np.unique(src.astype(np.int64) * num_node + dst.astype(np.int64))
    src, dst = eid // num_node, eid % num_node
    indptr = np.zeros(num_node + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr.astype(np.int32), dst.astype(np.int32)


def rmat_edges(
    num_node: int,
    num_edge: int,
    seed: int = 0,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    chunk: int = 1 << 24,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized RMAT edge generator (power-law degree distribution)."""
    rng = np.random.default_rng(seed)
    scale = int(np.ceil(np.log2(max(num_node, 2))))
    srcs, dsts = [], []
    remaining = num_edge
    while remaining > 0:
        n = min(chunk, remaining)
        src = np.zeros(n, dtype=np.int64)
        dst = np.zeros(n, dtype=np.int64)
        for _ in range(scale):
            r = rng.random(n)
            src <<= 1
            dst <<= 1
            # quadrant probabilities: a (0,0), b (0,1), c (1,0), d (1,1)
            go_right = (r >= a) & (r < a + b) | (r >= a + b + c)
            go_down = r >= a + b
            dst |= go_right.astype(np.int64)
            src |= go_down.astype(np.int64)
        src %= num_node
        dst %= num_node
        keep = src != dst
        srcs.append(src[keep])
        dsts.append(dst[keep])
        remaining -= n
    return np.concatenate(srcs), np.concatenate(dsts)


def powerlaw_edges(
    num_node: int,
    num_edge: int,
    seed: int = 0,
    alpha: float = 0.45,
) -> tuple[np.ndarray, np.ndarray]:
    """Fast heavy-tailed edge generator (inverse-CDF sampling).

    Endpoint ranks are drawn with P(rank=i) ∝ (i+1)^(-alpha) via the inverse
    CDF ``rank = N * u^(1/(1-alpha))``, then mapped through independent random
    permutations for src/dst so hubs are uncorrelated.  ~50x faster than
    bit-recursive RMAT at the same degree skew (what matters for cache
    realism), used for benchmark-scale graphs.
    """
    rng = np.random.default_rng(seed)
    exp = 1.0 / (1.0 - alpha)

    def draw(n, perm):
        u = rng.random(n)
        ranks = np.minimum(
            (num_node * np.power(u, exp)).astype(np.int64), num_node - 1
        )
        return perm[ranks]

    perm_s = rng.permutation(num_node).astype(np.int64)
    perm_d = rng.permutation(num_node).astype(np.int64)
    src = draw(num_edge, perm_s)
    dst = draw(num_edge, perm_d)
    keep = src != dst
    return src[keep], dst[keep]


def make_synthetic_dataset(
    num_node: int = 10_000,
    avg_degree: int = 10,
    feat_dim: int = 64,
    num_class: int = 16,
    train_frac: float = 0.1,
    seed: int = 0,
    power_law: bool = True,
    with_feat: bool = True,
    planted_signal: float = 0.0,
    name: str = "synthetic",
) -> Dataset:
    """Build a synthetic Dataset.

    With ``planted_signal > 0`` node features carry a class-dependent mean
    shared with neighbors (labels propagate by majority-ish construction), so
    a GNN can genuinely learn — used for end-to-end learning tests.
    """
    rng = np.random.default_rng(seed)
    num_edge = num_node * avg_degree
    label = rng.integers(0, num_class, num_node).astype(np.int64)
    if power_law == "rmat":
        src, dst = rmat_edges(num_node, num_edge, seed=seed)
    elif power_law:
        src, dst = powerlaw_edges(num_node, num_edge, seed=seed)
    else:
        src = rng.integers(0, num_node, num_edge)
        dst = rng.integers(0, num_node, num_edge)
        keep = src != dst
        src, dst = src[keep], dst[keep]
    if planted_signal > 0:
        # homophily: rewire most edges within the same class so neighbor
        # aggregation carries label signal (GCN has no self path)
        order = np.argsort(label, kind="stable")
        class_start = np.searchsorted(label[order], np.arange(num_class))
        class_count = np.bincount(label, minlength=num_class)
        rewire = rng.random(len(src)) < 0.8
        cls = label[src[rewire]]
        pick = class_start[cls] + rng.integers(0, 1 << 62, rewire.sum()) % np.maximum(
            class_count[cls], 1
        )
        dst = dst.copy()
        dst[rewire] = order[pick]
        keep = src != dst
        src, dst = src[keep], dst[keep]
    # symmetrize so sampling in either direction sees edges
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    indptr, indices = _coo_to_csr(src, dst, num_node)
    num_edge = len(indices)
    feat = None
    if with_feat:
        feat = rng.standard_normal((num_node, feat_dim), dtype=np.float32)
        if planted_signal > 0:
            # class centroids injected into features → learnable signal
            centroids = rng.standard_normal((num_class, feat_dim), dtype=np.float32)
            feat += planted_signal * centroids[label]

    perm = rng.permutation(num_node).astype(np.int32)
    n_train = max(1, int(num_node * train_frac))
    n_valid = max(1, int(num_node * 0.05))
    ds = Dataset(
        name=name,
        num_node=num_node,
        num_edge=num_edge,
        feat_dim=feat_dim,
        num_class=num_class,
        indptr=indptr,
        indices=indices,
        feat=feat,
        label=label,
        train_set=perm[:n_train],
        valid_set=perm[n_train : n_train + n_valid],
        test_set=perm[n_train + n_valid : n_train + 2 * n_valid],
    )
    ds.validate()
    return ds


def plant_hop2_task(
    ds: Dataset,
    label_noise: float = 0.15,
    token_alpha: float = 0.55,
    feat_noise: float = 1.0,
    seed: int = 0,
) -> Dataset:
    """Re-label a dataset with a NON-saturating aggregation-dependent task.

    The planted-signal task puts the class centroid in each node's OWN
    features, so a feature-only MLP solves it and time-to-accuracy curves
    discriminate nothing (round-4 verdict item: 99%+ by epoch 2).  This task
    makes neighborhood aggregation carry the signal:

    - the dataset's existing labels are treated as hidden COMMUNITIES
      (build the graph with ``planted_signal > 0`` so 80% of edges are
      rewired intra-community — homophily lives in the TOPOLOGY);
    - every node gets an observed token ``t_v``: its community with prob
      ``1 - token_alpha``, uniform-random otherwise — one noisy vote;
    - ``label_v = argmax_c`` (#2-hop walks from v landing on token c), then
      flipped to uniform-random with prob ``label_noise`` → the accuracy
      ceiling sits near ``(1-label_noise) + label_noise/C``, NOT 100%;
    - features expose ONLY the node's own token (one-hot + Gaussian noise).

    A feature-only MLP sees a single α-noisy vote (≈ ``(1-α)(1-ρ)`` ceiling,
    ~45% at the defaults); each aggregation hop adds fanout× more votes, so
    a working 2-3-layer GNN climbs to the label-noise ceiling (~86%) while
    an aggregation bug collapses it onto the MLP.  Fills the reference
    figure15b role (time-to-accuracy separation vs an independent baseline)
    for the egress-free environment.  Mutates and returns ``ds``.
    """
    rng = np.random.default_rng(seed)
    n = ds.num_node
    C_ = int(ds.num_class)
    g = np.asarray(ds.label).astype(np.int64)
    t = np.where(
        rng.random(n) < token_alpha, rng.integers(0, C_, n), g
    ).astype(np.int64)
    indptr64 = np.asarray(ds.indptr).astype(np.int64)
    deg = np.diff(indptr64)
    row = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = np.asarray(ds.indices).astype(np.int64)
    counts1 = np.zeros((n, C_), np.float64)
    for c in range(C_):
        counts1[:, c] = np.bincount(row, weights=(t[dst] == c), minlength=n)
    counts2 = np.zeros((n, C_), np.float64)
    for c in range(C_):
        counts2[:, c] = np.bincount(
            row, weights=counts1[dst, c], minlength=n
        )
    # deterministic tiebreak, then label noise
    label = np.argmax(counts2 + rng.random((n, C_)) * 1e-6, axis=1)
    flip = rng.random(n) < label_noise
    label[flip] = rng.integers(0, C_, int(flip.sum()))
    ds.label = label.astype(np.int64)
    feat = rng.standard_normal((n, ds.feat_dim), dtype=np.float32) * feat_noise
    feat[np.arange(n), t % ds.feat_dim] += 3.0
    ds.feat = feat
    return ds


def build_alias_tables(ds: Dataset, seed: int = 0) -> None:
    """Attach weighted-sampling tables (random edge weights) to a dataset.

    Mirrors the reference datagen outputs ``prob_table.bin`` /
    ``alias_table.bin`` / ``prob_prefix_table.bin`` (engine.cc:360-380;
    generator ``utility/data-process/toolkit/weight/create_alias_table.cc``):
    per-node alias method over that node's edge-weight slice, stored
    edge-aligned.  Alias entries are **global destination node ids**
    (create_alias_table.cc:152 stores ``indices[off+large_idx]``), so the
    sampling kernel can use them directly as neighbors.
    """
    rng = np.random.default_rng(seed)
    weights = rng.random(ds.num_edge).astype(np.float32) + 0.1
    prob = np.zeros(ds.num_edge, dtype=np.float32)
    alias = np.zeros(ds.num_edge, dtype=np.int32)
    prefix = np.zeros(ds.num_edge, dtype=np.float32)
    indptr = ds.indptr
    indices = ds.indices
    for v in range(ds.num_node):
        s, e = int(indptr[v]), int(indptr[v + 1])
        d = e - s
        if d == 0:
            continue
        w = weights[s:e].astype(np.float64)
        prefix[s:e] = np.cumsum(w)
        p = w * d / w.sum()
        small = [i for i in range(d) if p[i] < 1.0]
        large = [i for i in range(d) if p[i] >= 1.0]
        pr = p.copy()
        al = np.asarray(indices[s:e], dtype=np.int64).copy()  # self → taken at prob 1
        while small and large:
            sm, lg = small.pop(), large.pop()
            al[sm] = indices[s + lg]
            pr[lg] = pr[lg] - (1.0 - pr[sm])
            (small if pr[lg] < 1.0 else large).append(lg)
        # leftovers take their own slot with certainty (reference
        # create_alias_table.cc:163-175 sets prob = 1)
        for i in small + large:
            pr[i] = 1.0
        prob[s:e] = pr.clip(0.0, 1.0)
        alias[s:e] = al
    ds.prob_table = prob
    ds.alias_table = alias
    ds.prob_prefix_table = prefix
