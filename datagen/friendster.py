"""com-friendster (Graphalytics distribution): ``com-friendster.v`` (one
vertex id per line) + ``com-friendster.e`` (``src dst`` per line, undirected
edges listed once).

Reference behavior (``datagen/friendster.py`` +
``comfriendster_csr_generator.cc``): raw vertex ids are NOT contiguous —
they are remapped dense (an o2n hashtable in the C++ generator; vectorized
``searchsorted`` here), edges doubled (undirected), CSR written.  Friendster
has no natural features/labels: the reference ships synthetic split files
(1M/200k/100k nodes) and trains with fake features (``--empty-feat`` /
``SAMGRAPH_FAKE_FEAT_DIM``), which this framework's loader mirrors with
``load_dataset(..., fake_feat_dim=...)``.  Splits here are drawn from a
seeded shuffle with the same sizes.
"""

from __future__ import annotations

import os

import numpy as np

from . import coo_to_csr, write_meta, write_u32

FEAT_DIM = 140  # reference meta (datagen/friendster.py write_gnnlab_meta)
NUM_CLASS = 100
SPLIT_SIZES = (1_000_000, 200_000, 100_000)


def convert_friendster(raw_dir: str, out_dir: str, seed: int = 0):
    j = os.path.join
    vpath = j(raw_dir, "com-friendster.v")
    epath = j(raw_dir, "com-friendster.e")
    vids = np.loadtxt(vpath, dtype=np.int64).reshape(-1)
    edges = np.loadtxt(epath, dtype=np.int64, ndmin=2)
    vids.sort()
    num_node = len(vids)

    # dense remap: raw id → rank in the sorted vertex list
    src = np.searchsorted(vids, edges[:, 0])
    dst = np.searchsorted(vids, edges[:, 1])
    indptr, indices = coo_to_csr(
        num_node,
        np.concatenate([src, dst]),
        np.concatenate([dst, src]),
    )

    write_u32(j(out_dir, "indptr.bin"), indptr)
    write_u32(j(out_dir, "indices.bin"), indices)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_node).astype(np.uint32)
    sizes = [min(s, num_node // 3) for s in SPLIT_SIZES]
    off = 0
    for name, s in zip(("train", "valid", "test"), sizes):
        write_u32(j(out_dir, f"{name}_set.bin"), perm[off : off + s])
        off += s
    write_meta(out_dir, num_node, len(indices), FEAT_DIM, NUM_CLASS, *sizes)
    print(
        f"com-friendster: {num_node} nodes {len(indices)} edges -> {out_dir} "
        f"(no feat.bin/label.bin: train with fake_feat_dim={FEAT_DIM})"
    )
