"""mag240M homogeneous conversion (OGB-LSC layout).

Reference behavior (``datagen/mag240M-homo-graph.py``): the heterogeneous
MAG graph is flattened into ONE homogeneous id space —
``[papers | authors | institutions]`` — with every relation symmetrized:
paper↔paper citations, author↔paper writes, author↔institution affiliation.
Paper features (float16) become the feature table prefix; author/institution
rows are zero (only paper nodes are ever seeds — splits are paper ids).

Raw layout (OGB-LSC ``mag240m_kddcup2021/``): ``meta.pt``/``split_dict.pt``
(torch pickles), ``processed/paper/node_feat.npy`` (memmap-able f16),
``processed/paper/node_label.npy``, and per-relation
``processed/<rel>/edge_index.npy``.
"""

from __future__ import annotations

import os

import numpy as np

from . import coo_to_csr, write_feat, write_meta, write_u32

NUM_CLASS = 153


def convert_mag240m_homo(raw_dir: str, out_dir: str):
    import torch  # meta/split are torch pickles in the OGB-LSC bundle

    j = os.path.join
    meta = torch.load(j(raw_dir, "meta.pt"), weights_only=False)
    n_paper, n_author, n_inst = (
        int(meta["paper"]), int(meta["author"]), int(meta["institution"])
    )
    num_node = n_paper + n_author + n_inst

    def rel(name):
        return np.load(j(raw_dir, "processed", name, "edge_index.npy"),
                       mmap_mode="r")

    cites = rel("paper___cites___paper")
    writes = rel("author___writes___paper")
    affil = rel("author___affiliated_with___institution")

    # homogeneous ids: papers [0, P), authors [P, P+A), inst [P+A, N)
    srcs = [
        cites[0], cites[1],
        writes[0] + n_paper, writes[1],
        affil[0] + n_paper, affil[1] + n_paper + n_author,
    ]
    dsts = [
        cites[1], cites[0],
        writes[1], writes[0] + n_paper,
        affil[1] + n_paper + n_author, affil[0] + n_paper,
    ]
    indptr, indices = coo_to_csr(
        num_node,
        np.concatenate([np.asarray(s, np.int64) for s in srcs]),
        np.concatenate([np.asarray(d, np.int64) for d in dsts]),
    )
    write_u32(j(out_dir, "indptr.bin"), indptr)
    write_u32(j(out_dir, "indices.bin"), indices)

    feat = np.load(j(raw_dir, "processed", "paper", "node_feat.npy"),
                   mmap_mode="r")
    feat_dim = feat.shape[1]
    # stream papers' f16 rows, then zero rows for author/institution nodes
    write_feat(j(out_dir, "feat.bin"), feat, dtype=np.float16)
    with open(j(out_dir, "feat.bin"), "ab") as f:
        zeros = np.zeros((1 << 16, feat_dim), np.float16)
        left = n_author + n_inst
        while left > 0:
            take = min(left, len(zeros))
            zeros[:take].tofile(f)
            left -= take

    lab_p = np.load(j(raw_dir, "processed", "paper", "node_label.npy"),
                    mmap_mode="r")
    lab = np.full(num_node, -1, np.int64)
    lp = np.asarray(lab_p, np.float64)
    lab[:n_paper] = np.where(np.isnan(lp), -1, lp).astype(np.int64)
    lab.tofile(j(out_dir, "label.bin"))

    split = torch.load(j(raw_dir, "split_dict.pt"), weights_only=False)
    sizes = []
    for name, key in (("train", "train"), ("valid", "valid"),
                      ("test", "test-dev" if "test-dev" in split else "valid")):
        idx = np.asarray(split[key], np.uint32)
        write_u32(j(out_dir, f"{name}_set.bin"), idx)
        sizes.append(len(idx))
    write_meta(out_dir, num_node, len(indices), feat_dim, NUM_CLASS, *sizes,
               feat_type="F16")
    print(f"mag240m-homo: {num_node} nodes {len(indices)} edges -> {out_dir}")
