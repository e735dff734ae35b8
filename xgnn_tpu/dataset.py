"""Dataset container and binary-format loader.

Byte-compatible with the reference's dataset layout so that graphs converted
by its ``datagen`` tooling drop in directly: ``meta.txt`` (``KEY VALUE``
lines) + uint32 CSR (``indptr.bin``/``indices.bin``) + float32 ``feat.bin`` +
int64 ``label.bin`` + uint32 node-id sets — see reference
``samgraph/common/engine.cc:109-443`` (loader) and
``utility/fastgraph/fastgraph/meta_reader.py`` (meta format).

Topology and node sets are loaded as numpy mmaps (host RAM tier); what goes
to HBM is decided by the feature store / engine, not here.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from . import constants as C

_FEAT_DTYPES = {"F32": np.float32, "F16": np.float16}


@dataclasses.dataclass
class Dataset:
    """In-memory (mmap-backed) graph dataset (reference common.h:216-243)."""

    name: str
    num_node: int
    num_edge: int
    feat_dim: int
    num_class: int
    indptr: np.ndarray  # (num_node + 1,) int32/int64 view of uint32 file
    indices: np.ndarray  # (num_edge,) int32
    feat: Optional[np.ndarray]  # (num_node, feat_dim) float32 (mmap)
    label: Optional[np.ndarray]  # (num_node,) int64
    train_set: np.ndarray  # (num_train,) int32 node ids
    valid_set: np.ndarray
    test_set: np.ndarray
    # weighted-sampling auxiliary tables (alias method / prefix sums), aligned
    # with ``indices`` (reference engine.cc:360-380)
    prob_table: Optional[np.ndarray] = None
    alias_table: Optional[np.ndarray] = None
    prob_prefix_table: Optional[np.ndarray] = None
    in_degrees: Optional[np.ndarray] = None
    out_degrees: Optional[np.ndarray] = None
    # static cache rankings (node ids, hottest first)
    cache_rankings: dict = dataclasses.field(default_factory=dict)

    @property
    def degrees(self) -> np.ndarray:
        """Out-degrees from CSR (sampling fans out along indptr rows)."""
        if self.out_degrees is not None:
            return self.out_degrees
        return np.diff(self.indptr)

    def validate(self):
        assert self.indptr.shape == (self.num_node + 1,)
        assert self.indptr[0] == 0 and self.indptr[-1] == self.num_edge
        assert self.indices.shape == (self.num_edge,)
        if self.feat is not None:
            assert self.feat.shape == (self.num_node, self.feat_dim)


def _read_meta(path: str) -> dict:
    meta = {C.META_FEAT_DATA_TYPE: "F32"}
    with open(os.path.join(path, C.META_FILE)) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            key, value = parts
            meta[key] = value if key == C.META_FEAT_DATA_TYPE else int(value)
    for key in (
        C.META_NUM_NODE,
        C.META_NUM_EDGE,
        C.META_FEAT_DIM,
        C.META_NUM_CLASS,
        C.META_NUM_TRAIN_SET,
        C.META_NUM_VALID_SET,
        C.META_NUM_TEST_SET,
    ):
        if key not in meta:
            raise ValueError(f"meta.txt missing {key}")
    return meta


def _mmap(path: str, dtype, shape) -> np.ndarray:
    return np.memmap(path, dtype=dtype, mode="r", shape=shape)


def _maybe_mmap(path: str, dtype, shape) -> Optional[np.ndarray]:
    return _mmap(path, dtype, shape) if os.path.isfile(path) else None


def load_dataset(
    path: str,
    name: Optional[str] = None,
    load_feat: bool = True,
    fake_feat_dim: Optional[int] = None,
) -> Dataset:
    """Load a dataset directory in the reference binary format.

    ``fake_feat_dim`` mirrors the reference's synthetic-feature escape hatch
    for datasets whose real features don't fit (``SAMGRAPH_FAKE_FEAT_DIM``,
    reference engine.cc:198-235): features are generated, not read.
    """
    meta = _read_meta(path)
    num_node = meta[C.META_NUM_NODE]
    num_edge = meta[C.META_NUM_EDGE]
    feat_dim = meta[C.META_FEAT_DIM]

    j = os.path.join
    # The on-disk id space is uint32 (reference common/constant.h:75
    # kEmptyKey=0xffffffff): node ids fit int32 (< 2^31 in every reference
    # dataset), but ``indptr`` holds EDGE OFFSETS up to ``num_edge`` — which
    # exceeds 2^31 for com-friendster (~3.6B directed) and mag240m-homo
    # (~2.6B).  Small graphs keep the zero-copy int32 view; big graphs keep
    # the mmap as uint32 (numpy reads offsets up to 2^32-1 correctly) and
    # every 64-bit-capable consumer (host sampling, partitioning — which
    # REBASES per-part offsets back into int32 range) promotes via int64
    # arithmetic.  Device-side arrays never hold >=2^31 offsets by design:
    # Graph.from_dataset refuses, partition_csr_host hard-asserts per-part
    # edge counts (see those docstrings).
    if num_node + 1 >= 2**31:
        raise ValueError(
            f"num_node {num_node} exceeds the uint32-id design point"
        )
    if num_edge >= 2**32:
        raise ValueError(
            f"num_edge {num_edge} exceeds the uint32 offset space "
            "(the reference binary format caps at 2^32 edges)"
        )
    indptr = _mmap(j(path, C.INDPTR_FILE), np.uint32, (num_node + 1,))
    if num_edge < 2**31:
        indptr = indptr.view(np.int32)
    # consistency hard-assert: catches truncated/corrupt indptr files AND
    # any 32-bit mis-view of big offsets (touches only two mmap pages)
    if int(indptr[0]) != 0 or int(indptr[-1]) != num_edge:
        raise ValueError(
            f"indptr.bin inconsistent with meta.txt: indptr[0]="
            f"{int(indptr[0])}, indptr[-1]={int(indptr[-1])}, "
            f"NUM_EDGE={num_edge}"
        )
    indices = _mmap(j(path, C.INDICES_FILE), np.uint32, (num_edge,)).view(np.int32)

    feat = None
    if fake_feat_dim:
        feat_dim = fake_feat_dim
        rng = np.random.default_rng(0)
        feat = rng.standard_normal((num_node, feat_dim), dtype=np.float32)
    elif load_feat:
        feat_dtype = _FEAT_DTYPES[meta[C.META_FEAT_DATA_TYPE]]
        feat = _maybe_mmap(j(path, C.FEAT_FILE), feat_dtype, (num_node, feat_dim))

    label = _maybe_mmap(j(path, C.LABEL_FILE), np.int64, (num_node,))

    def _set(fname, n):
        return np.asarray(
            _mmap(j(path, fname), np.uint32, (n,)).view(np.int32)
        )

    ds = Dataset(
        name=name or os.path.basename(os.path.normpath(path)),
        num_node=num_node,
        num_edge=num_edge,
        feat_dim=feat_dim,
        num_class=meta[C.META_NUM_CLASS],
        indptr=indptr,
        indices=indices,
        feat=feat,
        label=label,
        train_set=_set(C.TRAIN_SET_FILE, meta[C.META_NUM_TRAIN_SET]),
        valid_set=_set(C.VALID_SET_FILE, meta[C.META_NUM_VALID_SET]),
        test_set=_set(C.TEST_SET_FILE, meta[C.META_NUM_TEST_SET]),
        prob_table=_maybe_mmap(j(path, C.PROB_TABLE_FILE), np.float32, (num_edge,)),
        alias_table=(
            a.view(np.int32)
            if (a := _maybe_mmap(j(path, C.ALIAS_TABLE_FILE), np.uint32, (num_edge,)))
            is not None
            else None
        ),
        prob_prefix_table=_maybe_mmap(
            j(path, C.PROB_PREFIX_TABLE_FILE), np.float32, (num_edge,)
        ),
        in_degrees=(
            d.view(np.int32)
            if (d := _maybe_mmap(j(path, C.IN_DEGREE_FILE), np.uint32, (num_node,)))
            is not None
            else None
        ),
        out_degrees=(
            d.view(np.int32)
            if (d := _maybe_mmap(j(path, C.OUT_DEGREE_FILE), np.uint32, (num_node,)))
            is not None
            else None
        ),
    )
    # static cache ranking files (hottest-first node-id lists)
    for policy, fname in (
        ("degree", C.CACHE_BY_DEGREE_FILE),
        ("heuristic", C.CACHE_BY_HEURISTIC_FILE),
        ("degree_hop", C.CACHE_BY_DEGREE_HOP_FILE),
        ("fake_optimal", C.CACHE_BY_FAKE_OPTIMAL_FILE),
        ("random", C.CACHE_BY_RANDOM_FILE),
    ):
        r = _maybe_mmap(j(path, fname), np.uint32, (num_node,))
        if r is not None:
            ds.cache_rankings[policy] = r.view(np.int32)
    return ds


def save_dataset(ds: Dataset, path: str):
    """Write a dataset directory in the reference binary format (the
    ``datagen`` converter's output contract, reference datagen/README.md)."""
    os.makedirs(path, exist_ok=True)
    j = os.path.join
    if ds.num_edge >= 2**32:
        raise ValueError(
            f"num_edge {ds.num_edge} does not fit the uint32 offset space"
        )

    def _w(fname, arr, dtype):
        np.ascontiguousarray(arr, dtype=dtype).tofile(j(path, fname))

    _w(C.INDPTR_FILE, ds.indptr, np.uint32)
    _w(C.INDICES_FILE, ds.indices, np.uint32)
    if ds.feat is not None:
        _w(C.FEAT_FILE, ds.feat, np.float32)
    if ds.label is not None:
        _w(C.LABEL_FILE, ds.label, np.int64)
    _w(C.TRAIN_SET_FILE, ds.train_set, np.uint32)
    _w(C.VALID_SET_FILE, ds.valid_set, np.uint32)
    _w(C.TEST_SET_FILE, ds.test_set, np.uint32)
    if ds.prob_table is not None:
        _w(C.PROB_TABLE_FILE, ds.prob_table, np.float32)
    if ds.alias_table is not None:
        _w(C.ALIAS_TABLE_FILE, ds.alias_table, np.uint32)
    if ds.prob_prefix_table is not None:
        _w(C.PROB_PREFIX_TABLE_FILE, ds.prob_prefix_table, np.float32)
    for policy, ranking in ds.cache_rankings.items():
        fname = {
            "degree": C.CACHE_BY_DEGREE_FILE,
            "heuristic": C.CACHE_BY_HEURISTIC_FILE,
            "degree_hop": C.CACHE_BY_DEGREE_HOP_FILE,
            "fake_optimal": C.CACHE_BY_FAKE_OPTIMAL_FILE,
            "random": C.CACHE_BY_RANDOM_FILE,
        }[policy]
        _w(fname, ranking, np.uint32)
    with open(j(path, C.META_FILE), "w") as f:
        feat_dim = ds.feat_dim
        f.write(f"{C.META_NUM_NODE} {ds.num_node}\n")
        f.write(f"{C.META_NUM_EDGE} {ds.num_edge}\n")
        f.write(f"{C.META_FEAT_DIM} {feat_dim}\n")
        f.write(f"{C.META_FEAT_DATA_TYPE} F32\n")
        f.write(f"{C.META_NUM_CLASS} {ds.num_class}\n")
        f.write(f"{C.META_NUM_TRAIN_SET} {len(ds.train_set)}\n")
        f.write(f"{C.META_NUM_VALID_SET} {len(ds.valid_set)}\n")
        f.write(f"{C.META_NUM_TEST_SET} {len(ds.test_set)}\n")
