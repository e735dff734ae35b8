"""Dataset binary format: save/load round trip + reference layout checks +
the C++ convert toolkit."""

import os
import subprocess

import numpy as np
import pytest

from xgnn_tpu import constants as C
from xgnn_tpu import load_dataset, save_dataset, synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def convert_exe():
    """The xgnn-convert CLI, auto-built on demand (skip only if no
    compiler is available in the environment)."""
    from xgnn_tpu import clib

    exe = clib.convert_path()
    if exe is None:
        pytest.skip("no C++ compiler available to build xgnn-convert")
    return exe


def test_roundtrip(tmp_path, tiny_ds):
    synthetic.build_alias_tables(tiny_ds)
    path = str(tmp_path / "ds")
    save_dataset(tiny_ds, path)

    # reference layout: exact file names, uint32 CSR, int64 labels
    for f in (C.META_FILE, C.INDPTR_FILE, C.INDICES_FILE, C.FEAT_FILE,
              C.LABEL_FILE, C.TRAIN_SET_FILE, C.PROB_TABLE_FILE):
        assert os.path.isfile(os.path.join(path, f)), f
    raw = np.fromfile(os.path.join(path, C.INDPTR_FILE), dtype=np.uint32)
    assert raw[-1] == tiny_ds.num_edge

    ds2 = load_dataset(path)
    assert ds2.num_node == tiny_ds.num_node
    assert ds2.num_edge == tiny_ds.num_edge
    np.testing.assert_array_equal(ds2.indptr, tiny_ds.indptr)
    np.testing.assert_array_equal(ds2.indices, tiny_ds.indices)
    np.testing.assert_allclose(ds2.feat, tiny_ds.feat)
    np.testing.assert_array_equal(ds2.label, tiny_ds.label)
    np.testing.assert_array_equal(ds2.train_set, tiny_ds.train_set)
    np.testing.assert_allclose(ds2.prob_table, tiny_ds.prob_table)
    np.testing.assert_array_equal(ds2.alias_table, tiny_ds.alias_table)


def test_fake_feat_dim(tmp_path, tiny_ds):
    path = str(tmp_path / "ds")
    save_dataset(tiny_ds, path)
    ds2 = load_dataset(path, fake_feat_dim=7)
    assert ds2.feat.shape == (tiny_ds.num_node, 7)


def test_cpp_toolkit(tmp_path, tiny_ds, convert_exe):
    path = str(tmp_path / "ds")
    save_dataset(tiny_ds, path)
    exe = convert_exe

    r = subprocess.run([exe, "degrees", path], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out_deg = np.fromfile(os.path.join(path, C.OUT_DEGREE_FILE), np.uint32)
    np.testing.assert_array_equal(out_deg, np.diff(tiny_ds.indptr))

    r = subprocess.run([exe, "cache-by-degree", path], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    rank = np.fromfile(os.path.join(path, C.CACHE_BY_DEGREE_FILE), np.uint32)
    degs = np.diff(tiny_ds.indptr)
    assert degs[rank[0]] == degs.max()
    assert np.all(np.diff(degs[rank].astype(np.int64)) <= 0)

    # coo2csr: rebuild the CSR from an edge list and compare
    coo = []
    for v in range(tiny_ds.num_node):
        for u in tiny_ds.indices[tiny_ds.indptr[v]:tiny_ds.indptr[v+1]]:
            coo.extend([v, int(u)])
    edges_path = str(tmp_path / "edges.bin")
    np.asarray(coo, np.uint32).tofile(edges_path)
    out_dir = str(tmp_path / "conv")
    os.makedirs(out_dir, exist_ok=True)
    r = subprocess.run(
        [exe, "coo2csr", edges_path, out_dir, str(tiny_ds.num_node)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    ip = np.fromfile(os.path.join(out_dir, C.INDPTR_FILE), np.uint32)
    ix = np.fromfile(os.path.join(out_dir, C.INDICES_FILE), np.uint32)
    np.testing.assert_array_equal(ip, tiny_ds.indptr.astype(np.uint32))
    np.testing.assert_array_equal(ix, tiny_ds.indices.astype(np.uint32))


def test_cpp_weights_and_rankings(tmp_path, tiny_ds, convert_exe):
    """create-weights emits reference-format alias tables (global node ids);
    degree-hop / heuristic rankings are valid permutations."""
    from xgnn_tpu import load_dataset, save_dataset

    path = str(tmp_path / "ds")
    save_dataset(tiny_ds, path)
    exe = convert_exe

    r = subprocess.run([exe, "create-weights", path, "7"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    prob = np.fromfile(os.path.join(path, C.PROB_TABLE_FILE), np.float32)
    alias = np.fromfile(os.path.join(path, C.ALIAS_TABLE_FILE), np.uint32)
    prefix = np.fromfile(
        os.path.join(path, C.PROB_PREFIX_TABLE_FILE), np.float32
    )
    assert len(prob) == len(alias) == len(prefix) == tiny_ds.num_edge
    assert np.all((prob >= 0) & (prob <= 1.0 + 1e-5))
    for v in range(tiny_ds.num_node):
        s, e = tiny_ds.indptr[v], tiny_ds.indptr[v + 1]
        if e == s:
            continue
        row = set(tiny_ds.indices[s:e].tolist())
        # alias entries are global node ids within this node's neighbors
        assert set(alias[s:e].tolist()) <= row
        assert np.all(np.diff(prefix[s:e]) > 0)  # strictly increasing

    # the tables drive the weighted sampler end-to-end
    import jax
    import jax.numpy as jnp
    from xgnn_tpu.ops import sampling

    ds2 = load_dataset(path)
    frontier = jnp.asarray(
        np.arange(min(64, ds2.num_node), dtype=np.int32)
    )
    nbr = np.asarray(sampling.sample_weighted_khop(
        jnp.asarray(ds2.indptr), jnp.asarray(ds2.indices),
        jnp.asarray(ds2.prob_table), jnp.asarray(ds2.alias_table),
        frontier, 4, jax.random.key(0),
    ))
    for i in range(len(frontier)):
        got = nbr[i][nbr[i] != C.EMPTY_KEY]
        row = set(
            ds2.indices[ds2.indptr[i]:ds2.indptr[i + 1]].tolist()
        )
        assert set(got.tolist()) <= row

    for cmd, fname in (
        ("cache-by-degree-hop", C.CACHE_BY_DEGREE_HOP_FILE),
        ("cache-by-heuristic", C.CACHE_BY_HEURISTIC_FILE),
    ):
        r = subprocess.run([exe, cmd, path], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        rank = np.fromfile(os.path.join(path, fname), np.uint32)
        assert len(rank) == tiny_ds.num_node
        assert len(np.unique(rank)) == tiny_ds.num_node  # permutation
    # heuristic: the train set occupies the prefix
    rank = np.fromfile(
        os.path.join(path, C.CACHE_BY_HEURISTIC_FILE), np.uint32
    )
    assert set(rank[: len(tiny_ds.train_set)].tolist()) == set(
        np.unique(tiny_ds.train_set).tolist()
    )


def test_degree_hop_ranking_trailing_zero_degree():
    """Exact neighbor-degree sums, including graphs whose LAST nodes have
    zero out-degree (reduceat's clipped-start variant truncated the
    preceding node's segment: indptr=[0,1,3,3] scored node1 as 1, not 2)."""
    from types import SimpleNamespace

    from xgnn_tpu.store.ranking import _rank_by_degree_hop

    indptr = np.array([0, 1, 3, 3], np.int64)
    indices = np.array([1, 0, 0], np.int32)
    deg = np.array([1, 2, 0], np.int64)
    ds = SimpleNamespace(
        indptr=indptr, indices=indices, degrees=deg,
        num_node=3, num_edge=3,
    )
    order = _rank_by_degree_hop(ds)
    # scores: node0 = 1 + deg[1] = 3; node1 = 2 + deg[0]+deg[0] = 4; node2 = 0
    assert order.tolist() == [1, 0, 2]
