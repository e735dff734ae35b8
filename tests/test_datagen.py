"""Named-dataset converter round-trips (VERDICT r3 item 4): checked-in
~1k-node fixtures in the EXACT raw on-disk layouts (OGB csv.gz / npz,
Graphalytics .v/.e, OGB-LSC npy+pt) → datagen converters → binary dataset
directory → ``load_dataset`` → oracle CSR comparison (scipy ``coo.tocsr()``
is the same primitive the reference converters use, datagen/products.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from xgnn_tpu.dataset import load_dataset  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _scipy_csr(num_node, src, dst):
    from scipy.sparse import coo_matrix

    m = coo_matrix(
        (np.zeros(len(src)), (src, dst)), shape=(num_node, num_node)
    ).tocsr()
    return m.indptr.astype(np.int64), m.indices.astype(np.int64)


def _assert_csr_matches(ds, src, dst):
    iptr, idx = _scipy_csr(ds.num_node, src, dst)
    np.testing.assert_array_equal(np.asarray(ds.indptr, np.int64), iptr)
    np.testing.assert_array_equal(np.asarray(ds.indices, np.int64), idx)


def test_convert_products(tmp_path):
    import gzip

    from datagen import convert

    raw = os.path.join(FIXTURES, "ogb_products_tiny")
    out = str(tmp_path / "products")
    convert("products", raw, out)
    ds = load_dataset(out)
    ds.validate()

    with gzip.open(os.path.join(raw, "raw", "edge.csv.gz"), "rt") as f:
        edges = np.loadtxt(f, delimiter=",", dtype=np.int64)
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    _assert_csr_matches(ds, src, dst)
    assert ds.feat.shape == (ds.num_node, 8)
    assert ds.feat.dtype == np.float32
    assert len(ds.train_set) == 200 and len(ds.valid_set) == 60
    assert len(ds.test_set) == 140
    assert ds.num_class == int(np.asarray(ds.label).max()) + 1


def test_convert_papers100m(tmp_path):
    from datagen import convert

    raw = os.path.join(FIXTURES, "ogb_papers_tiny")
    out = str(tmp_path / "papers")
    convert("papers100M", raw, out)
    ds = load_dataset(out)
    ds.validate()

    data = np.load(os.path.join(raw, "raw", "data.npz"))
    ei = data["edge_index"]
    # transposed storage: row v = in-edges (the reference swaps src/dst)
    _assert_csr_matches(ds, ei[1], ei[0])
    lab_raw = np.load(os.path.join(raw, "raw", "node-label.npz"))["node_label"]
    lab = np.asarray(ds.label)
    np.testing.assert_array_equal(lab[np.isnan(lab_raw)], -1)
    ok = ~np.isnan(lab_raw)
    np.testing.assert_array_equal(lab[ok], lab_raw[ok].astype(np.int64))
    np.testing.assert_allclose(
        np.asarray(ds.feat), data["node_feat"], rtol=0, atol=0
    )
    assert len(ds.train_set) == 150


def test_convert_friendster(tmp_path):
    from datagen import convert

    raw = os.path.join(FIXTURES, "friendster_tiny")
    out = str(tmp_path / "friendster")
    convert("com-friendster", raw, out)
    # no feat.bin on purpose (fake-feat path, reference --empty-feat)
    ds = load_dataset(out, fake_feat_dim=16)
    ds.validate()
    assert ds.feat.shape == (ds.num_node, 16)

    vids = np.sort(np.loadtxt(os.path.join(raw, "com-friendster.v"),
                              dtype=np.int64))
    e = np.loadtxt(os.path.join(raw, "com-friendster.e"), dtype=np.int64)
    src = np.searchsorted(vids, e[:, 0])
    dst = np.searchsorted(vids, e[:, 1])
    _assert_csr_matches(
        ds, np.concatenate([src, dst]), np.concatenate([dst, src])
    )
    # splits partition distinct nodes
    allset = np.concatenate([ds.train_set, ds.valid_set, ds.test_set])
    assert len(np.unique(allset)) == len(allset)


def test_convert_mag240m(tmp_path):
    torch = pytest.importorskip("torch")
    from datagen import convert

    raw = os.path.join(FIXTURES, "mag240m_tiny")
    out = str(tmp_path / "mag")
    convert("mag240m-homo", raw, out)
    ds = load_dataset(out)
    ds.validate()

    meta = torch.load(os.path.join(raw, "meta.pt"), weights_only=False)
    n_p, n_a = meta["paper"], meta["author"]
    assert ds.num_node == n_p + n_a + meta["institution"]

    def rel(name):
        return np.load(os.path.join(raw, "processed", name, "edge_index.npy"))

    cites, writes, affil = (
        rel("paper___cites___paper"),
        rel("author___writes___paper"),
        rel("author___affiliated_with___institution"),
    )
    src = np.concatenate([
        cites[0], cites[1], writes[0] + n_p, writes[1],
        affil[0] + n_p, affil[1] + n_p + n_a,
    ])
    dst = np.concatenate([
        cites[1], cites[0], writes[1], writes[0] + n_p,
        affil[1] + n_p + n_a, affil[0] + n_p,
    ])
    _assert_csr_matches(ds, src, dst)
    # f16 features: papers real, the rest zero rows
    assert ds.feat.dtype == np.float16
    assert np.abs(np.asarray(ds.feat[n_p:])).sum() == 0
    lab = np.asarray(ds.label)
    assert (lab[n_p:] == -1).all()


def test_datagen_cli_with_cpp_poststeps(tmp_path):
    """The one-command path incl. the C++ toolkit post-steps (rankings +
    weighted tables), if the toolchain is available."""
    from xgnn_tpu.clib import convert_path

    from datagen.__main__ import main

    raw = os.path.join(FIXTURES, "ogb_products_tiny")
    out = str(tmp_path / "products")
    args = ["products", raw, out]
    has_cpp = convert_path() is not None
    if has_cpp:
        args += ["--rankings", "--weights"]
    main(args)
    ds = load_dataset(out)
    ds.validate()
    if has_cpp:
        assert "degree" in ds.cache_rankings
        assert ds.prob_table is not None and ds.alias_table is not None
        assert ds.prob_prefix_table is not None


def test_nodeset_generator(tmp_path):
    """xgnn-convert nodeset: distinct non-isolated draws + meta rewrite
    (reference toolkit/generator/nodeset_generator.cc)."""
    import subprocess

    import numpy as np

    from xgnn_tpu import synthetic
    from xgnn_tpu.clib import convert_path
    from xgnn_tpu.dataset import save_dataset

    conv = convert_path()
    if conv is None:
        import pytest

        pytest.skip("C++ toolkit unavailable")
    ds = synthetic.make_synthetic_dataset(
        num_node=400, avg_degree=5, feat_dim=8, num_class=3, seed=2
    )
    out = str(tmp_path / "ns")
    save_dataset(ds, out)
    r = subprocess.run(
        [conv, "nodeset", out, "40", "15", "15", "3"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    ds2 = load_dataset(out)
    assert len(ds2.train_set) == 40
    deg = np.diff(ds2.indptr.astype(np.int64))
    ids = np.concatenate([ds2.train_set, ds2.valid_set, ds2.test_set])
    assert (deg[ids] > 0).all()  # no isolated nodes
    assert len(np.unique(ids)) == len(ids)  # disjoint sets


def test_convert_then_train_e2e(tmp_path):
    """The full real-data path in one test: OGB-format raw fixture →
    converter → binary dataset dir → Engine trains on it (the switch-over
    story a reference user follows: datagen/README.md one-command convert,
    then examples/train.py --root-path/--dataset)."""
    import jax

    from datagen import convert
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine

    raw = os.path.join(FIXTURES, "ogb_products_tiny")
    convert("products", raw, str(tmp_path / "products"))
    ds = load_dataset(str(tmp_path / "products"))

    cfg = RunConfig(
        batch_size=32, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", num_epoch=2, lr=0.01,
        root_path=str(tmp_path), dataset="products",
    )
    eng = Engine(ds, cfg).init()
    r0 = eng.train_epoch(0)
    r1 = eng.train_epoch(1)
    assert np.isfinite(r0["loss"]) and np.isfinite(r1["loss"])
    acc = eng.evaluate("valid")
    assert np.isfinite(acc) and 0.0 <= acc <= 1.0
