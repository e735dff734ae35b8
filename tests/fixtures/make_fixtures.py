"""Generate the checked-in tiny raw-format fixtures for the datagen
converter tests: ~1k-node graphs written in the EXACT on-disk layouts the
real datasets ship in (OGB csv.gz / npz bundles, Graphalytics .v/.e text,
OGB-LSC npy+torch pickles).  Deterministic; re-run to regenerate.

    python tests/fixtures/make_fixtures.py
"""

import gzip
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
N, E, F = 1000, 3000, 8


def csv_gz(path, arr, fmt):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        for row in np.atleast_2d(arr.T if arr.ndim == 1 else arr):
            f.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")


def make_products(rng):
    d = os.path.join(HERE, "ogb_products_tiny")
    edges = rng.integers(0, N, (E, 2))
    feat = rng.standard_normal((N, F)).astype(np.float32)
    label = rng.integers(0, 12, N)
    csv_gz(os.path.join(d, "raw", "edge.csv.gz"), edges, "%d")
    csv_gz(os.path.join(d, "raw", "node-feat.csv.gz"), feat, "%.6f")
    csv_gz(os.path.join(d, "raw", "node-label.csv.gz"), label[:, None], "%d")
    perm = rng.permutation(N)
    for name, sl in (("train", slice(0, 200)), ("valid", slice(200, 260)),
                     ("test", slice(260, 400))):
        csv_gz(
            os.path.join(d, "split", "sales_ranking", f"{name}.csv.gz"),
            perm[sl][:, None], "%d",
        )


def make_papers(rng):
    d = os.path.join(HERE, "ogb_papers_tiny")
    os.makedirs(os.path.join(d, "raw"), exist_ok=True)
    edge_index = rng.integers(0, N, (2, E)).astype(np.int64)
    feat = rng.standard_normal((N, F)).astype(np.float32)
    label = rng.integers(0, 9, N).astype(np.float64)
    label[rng.random(N) < 0.5] = np.nan  # papers100M: most nodes unlabeled
    np.savez(os.path.join(d, "raw", "data.npz"),
             edge_index=edge_index, node_feat=feat)
    np.savez(os.path.join(d, "raw", "node-label.npz"), node_label=label)
    perm = rng.permutation(np.flatnonzero(~np.isnan(label)))
    for name, sl in (("train", slice(0, 150)), ("valid", slice(150, 200)),
                     ("test", slice(200, 280))):
        csv_gz(os.path.join(d, "split", "time", f"{name}.csv.gz"),
               perm[sl][:, None], "%d")


def make_friendster(rng):
    d = os.path.join(HERE, "friendster_tiny")
    os.makedirs(d, exist_ok=True)
    raw_ids = np.sort(rng.choice(100_000, N, replace=False))  # sparse id space
    e = raw_ids[rng.integers(0, N, (E, 2))]
    e = e[e[:, 0] != e[:, 1]]
    np.savetxt(os.path.join(d, "com-friendster.v"), raw_ids, fmt="%d")
    np.savetxt(os.path.join(d, "com-friendster.e"), e, fmt="%d %d")


def make_mag240m(rng):
    import torch

    d = os.path.join(HERE, "mag240m_tiny")
    n_p, n_a, n_i = 400, 300, 50
    torch.save({"paper": n_p, "author": n_a, "institution": n_i},
               os.path.join(d, "meta.pt") if os.path.isdir(d) else _mk(d, "meta.pt"))
    for rel, (a, b) in (
        ("paper___cites___paper", (n_p, n_p)),
        ("author___writes___paper", (n_a, n_p)),
        ("author___affiliated_with___institution", (n_a, n_i)),
    ):
        p = os.path.join(d, "processed", rel)
        os.makedirs(p, exist_ok=True)
        ei = np.stack([rng.integers(0, a, 800), rng.integers(0, b, 800)])
        np.save(os.path.join(p, "edge_index.npy"), ei.astype(np.int64))
    p = os.path.join(d, "processed", "paper")
    os.makedirs(p, exist_ok=True)
    np.save(os.path.join(p, "node_feat.npy"),
            rng.standard_normal((n_p, F)).astype(np.float16))
    lab = rng.integers(0, 5, n_p).astype(np.float64)
    lab[rng.random(n_p) < 0.4] = np.nan
    np.save(os.path.join(p, "node_label.npy"), lab)
    tr = rng.permutation(np.flatnonzero(~np.isnan(lab)))
    torch.save({"train": tr[:100], "valid": tr[100:140]},
               os.path.join(d, "split_dict.pt"))


def _mk(d, name):
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


if __name__ == "__main__":
    rng = np.random.default_rng(7)
    make_products(rng)
    make_papers(rng)
    make_friendster(rng)
    make_mag240m(rng)
    print("fixtures written under", HERE)
