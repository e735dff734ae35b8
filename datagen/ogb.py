"""OGB node-property datasets: ogbn-products and ogbn-papers100M.

Reads the PUBLISHED raw layouts (stable OGB on-disk formats):

- **products** (``datagen/products.py`` behavior): headerless csv.gz files —
  ``raw/edge.csv.gz`` (src,dst), ``raw/node-feat.csv.gz``,
  ``raw/node-label.csv.gz``, splits under ``split/sales_ranking/``.  The
  graph is undirected → edges doubled before CSR.
- **papers100M** (``datagen/papers100M.py`` behavior): npz bundles —
  ``raw/data.npz`` (``edge_index`` (2, E) + ``node_feat``),
  ``raw/node-label.npz`` (``node_label``), splits under ``split/time/``.
  The citation graph is directed; the converter stores the TRANSPOSED CSR
  (row v = papers citing v — the reference swaps src/dst so sampling walks
  in-edges).
"""

from __future__ import annotations

import os

import numpy as np

from . import (
    coo_to_csr,
    read_csv_gz_floats,
    read_csv_gz_ints,
    write_feat,
    write_meta,
    write_u32,
)


def _write_splits(out_dir: str, split_dir: str):
    sizes = []
    for name in ("train", "valid", "test"):
        idx = read_csv_gz_ints(
            os.path.join(split_dir, f"{name}.csv.gz")
        ).reshape(-1)
        write_u32(os.path.join(out_dir, f"{name}_set.bin"), idx)
        sizes.append(len(idx))
    return sizes


def convert_products(raw_dir: str, out_dir: str):
    j = os.path.join
    edges = read_csv_gz_ints(j(raw_dir, "raw", "edge.csv.gz")).T
    feat = read_csv_gz_floats(j(raw_dir, "raw", "node-feat.csv.gz"))
    label = read_csv_gz_ints(j(raw_dir, "raw", "node-label.csv.gz")).reshape(-1)
    num_node = feat.shape[0]

    # undirected: double the edges (reference products.py:63-65), then the
    # CSR build collapses duplicate pairs exactly like coo.tocsr() did
    src = np.concatenate([edges[0], edges[1]])
    dst = np.concatenate([edges[1], edges[0]])
    indptr, indices = coo_to_csr(num_node, src, dst)

    write_u32(j(out_dir, "indptr.bin"), indptr)
    write_u32(j(out_dir, "indices.bin"), indices)
    write_feat(j(out_dir, "feat.bin"), feat)
    np.ascontiguousarray(label, dtype=np.int64).tofile(j(out_dir, "label.bin"))
    sizes = _write_splits(out_dir, j(raw_dir, "split", "sales_ranking"))
    write_meta(
        out_dir, num_node, len(indices), feat.shape[1],
        int(label.max()) + 1, *sizes,
    )
    print(f"products: {num_node} nodes {len(indices)} edges -> {out_dir}")


def convert_papers100m(raw_dir: str, out_dir: str):
    j = os.path.join
    data = np.load(j(raw_dir, "raw", "data.npz"), mmap_mode="r")
    labels = np.load(j(raw_dir, "raw", "node-label.npz"), mmap_mode="r")
    feat = data["node_feat"]
    edge_index = data["edge_index"]
    label = np.asarray(labels["node_label"]).reshape(-1)
    num_node = feat.shape[0]

    # directed citations stored transposed: row v = in-edges of v
    # (reference papers100M.py:55-73 builds coo_matrix((data, (dst, src))))
    indptr, indices = coo_to_csr(num_node, edge_index[1], edge_index[0])

    write_u32(j(out_dir, "indptr.bin"), indptr)
    write_u32(j(out_dir, "indices.bin"), indices)
    write_feat(j(out_dir, "feat.bin"), feat)
    # raw labels are float with NaN for unlabeled nodes → -1 sentinel
    lab = np.where(np.isnan(label), -1, label).astype(np.int64)
    lab.tofile(j(out_dir, "label.bin"))
    sizes = _write_splits(out_dir, j(raw_dir, "split", "time"))
    num_class = int(lab.max()) + 1
    write_meta(
        out_dir, num_node, len(indices), feat.shape[1], num_class, *sizes
    )
    print(f"papers100M: {num_node} nodes {len(indices)} edges -> {out_dir}")
