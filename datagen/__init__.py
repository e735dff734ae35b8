"""Named-dataset converters: raw public formats → the framework's binary
dataset layout.

Mirrors the reference's ``datagen/`` toolkit (``datagen/README.md:1-60``,
``datagen/{products,papers100M,friendster,mag240M-homo-graph}.py``): each
converter reads the dataset's published on-disk layout and emits the
mmap-able directory this framework (and the reference) load directly —
``meta.txt`` + uint32 CSR ``indptr.bin``/``indices.bin`` + ``feat.bin`` +
int64 ``label.bin`` + uint32 ``{train,valid,test}_set.bin``.

Downloads are the user's step (this environment is egress-free; the
reference shells out to wget the same URLs — see README.md here for the
documented URLs).  Conversion itself is pure local compute:

    python -m datagen products        <raw_dir> <out_dir>
    python -m datagen papers100M      <raw_dir> <out_dir>
    python -m datagen com-friendster  <raw_dir> <out_dir>
    python -m datagen mag240m-homo    <raw_dir> <out_dir>

After conversion, cache rankings and weighted-sampling tables come from the
C++ toolkit (the reference's ``utility/data-process`` analog)::

    cpp/xgnn-convert cache-by-degree <out_dir>
    cpp/xgnn-convert create-weights  <out_dir>
"""

from __future__ import annotations

import gzip
import os

import numpy as np

CHUNK_ROWS = 1 << 20  # streaming write granularity for big feature matrices


def coo_to_csr(num_node: int, src: np.ndarray, dst: np.ndarray,
               dedup: bool = True):
    """COO edge list → row-sorted CSR (uint32), matching the reference
    converters' ``scipy.coo_matrix(...).tocsr()`` semantics: adjacency
    sorted within each row and duplicate (src, dst) pairs collapsed
    (``tocsr`` sums duplicates — reference ``datagen/products.py:69-73``).

    Pure numpy (lexsort = one pass); the C++ ``cpp/xgnn-convert coo2csr``
    does the same job with OMP for 1B+-edge inputs.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    order = np.lexsort((dst, src))  # src-major, dst-sorted within row
    src, dst = src[order], dst[order]
    if dedup and len(src):
        keep = np.concatenate(
            [[True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
        )
        src, dst = src[keep], dst[keep]
    deg = np.bincount(src, minlength=num_node)
    indptr = np.zeros(num_node + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    if int(indptr[-1]) >= 2**32:
        raise ValueError(
            f"{int(indptr[-1])} edges exceed the uint32 offset space of "
            "the binary format"
        )
    # uint32 offsets are exact up to 2^32-1 edges; the loader keeps the
    # mmap as uint32 past 2^31 (dataset.py big-offset path,
    # tests/test_big_offsets.py) — com-friendster (~3.6B) and mag240m
    # (~2.6B) land in that range
    return indptr.astype(np.uint32), dst.astype(np.uint32)


def write_u32(path: str, arr: np.ndarray):
    np.ascontiguousarray(arr, dtype=np.uint32).tofile(path)


def write_feat(path: str, feat: np.ndarray, dtype=np.float32):
    """Stream a (possibly mmap-backed) feature matrix to disk in chunks —
    never materializes a full in-memory copy (papers100M's feat is 53 GB)."""
    with open(path, "wb") as f:
        for i in range(0, feat.shape[0], CHUNK_ROWS):
            np.ascontiguousarray(
                feat[i : i + CHUNK_ROWS], dtype=dtype
            ).tofile(f)


def write_meta(out_dir: str, num_node: int, num_edge: int, feat_dim: int,
               num_class: int, n_train: int, n_valid: int, n_test: int,
               feat_type: str = "F32"):
    with open(os.path.join(out_dir, "meta.txt"), "w") as f:
        f.write(f"NUM_NODE {num_node}\n")
        f.write(f"NUM_EDGE {num_edge}\n")
        f.write(f"FEAT_DIM {feat_dim}\n")
        f.write(f"FEAT_DATA_TYPE {feat_type}\n")
        f.write(f"NUM_CLASS {num_class}\n")
        f.write(f"NUM_TRAIN_SET {n_train}\n")
        f.write(f"NUM_VALID_SET {n_valid}\n")
        f.write(f"NUM_TEST_SET {n_test}\n")


def read_csv_gz_ints(path: str) -> np.ndarray:
    """One- or two-column headerless csv.gz of integers (the OGB split and
    edge files)."""
    try:
        import pandas as pd

        return pd.read_csv(path, header=None).values
    except ImportError:  # numpy fallback
        with gzip.open(path, "rt") as f:
            return np.loadtxt(f, delimiter=",", dtype=np.int64, ndmin=2)


def read_csv_gz_floats(path: str) -> np.ndarray:
    try:
        import pandas as pd

        return pd.read_csv(path, header=None).values.astype(np.float32)
    except ImportError:
        with gzip.open(path, "rt") as f:
            return np.loadtxt(f, delimiter=",", dtype=np.float32, ndmin=2)


def convert(dataset: str, raw_dir: str, out_dir: str, **kw):
    from . import friendster, mag240m, ogb

    fns = {
        "products": ogb.convert_products,
        "papers100M": ogb.convert_papers100m,
        "com-friendster": friendster.convert_friendster,
        "mag240m-homo": mag240m.convert_mag240m_homo,
    }
    if dataset not in fns:
        raise SystemExit(
            f"unknown dataset {dataset!r}; choices: {sorted(fns)}"
        )
    os.makedirs(out_dir, exist_ok=True)
    return fns[dataset](raw_dir, out_dir, **kw)
