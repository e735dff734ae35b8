"""On-device graph generation: CSR invariants (simple, symmetric, loop-free)."""

import numpy as np

from xgnn_tpu.synthetic_device import make_device_dataset


def test_device_csr_invariants():
    ds = make_device_dataset(400, 2400, 8, 4, seed=3)
    ip = np.asarray(ds.graph.indptr)[: ds.num_node + 1]
    ind = np.asarray(ds.graph.indices)[: ds.num_edge]  # tile-padded tail
    assert ip[0] == 0 and ip[-1] == len(ind) == ds.num_edge
    es = set()
    for v in range(ds.num_node):
        ns = ind[ip[v] : ip[v + 1]]
        assert v not in ns  # no self loops
        assert np.all(np.diff(ns) > 0)  # sorted, no duplicates
        for u in ns:
            es.add((v, int(u)))
    assert all((u, v) in es for (v, u) in es)  # symmetric
    assert len(ds.train_set) > 0
    assert ds.feat.shape == (400, 8)


def test_device_dataset_trains():
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine

    ds = make_device_dataset(2000, 16000, 16, 4, seed=5, train_frac=0.2)
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", num_epoch=1, cache_percentage=0.0,
        pipeline=False, calibration_batches=1, root_path="/tmp",
    )
    engine = Engine(ds, config).init()
    r = engine.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_device_prefix_table_oracle():
    """On-device prob_prefix_table = row-local inclusive cumsum of positive
    weights (the reference prob_prefix_table.bin contract)."""
    ds = make_device_dataset(300, 3000, 4, 3, seed=11, weighted=True)
    g = ds.graph
    prefix = np.asarray(g.prob_prefix_table)
    indptr = np.asarray(g.indptr)
    e = g.num_edge
    assert prefix.shape[0] >= e
    for v in range(g.num_node):
        s, t = indptr[v], indptr[v + 1]
        if t <= s:
            continue
        row = prefix[s:t]
        w = np.diff(np.concatenate([[0.0], row]))
        assert np.all(w > 0.05), (v, w.min())  # weights in (0.1, 1.0) ± fp
        assert np.all(w < 1.05)
        np.testing.assert_allclose(row, np.cumsum(w), rtol=1e-5)


def test_device_weighted_prefix_trains():
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine

    ds = make_device_dataset(2000, 16000, 16, 4, seed=5, train_frac=0.2,
                             weighted=True)
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="weighted_khop_prefix", num_epoch=1,
        cache_percentage=0.0, pipeline=False, calibration_batches=1,
        root_path="/tmp",
    )
    engine = Engine(ds, config).init()
    r = engine.train_epoch(0)
    assert np.isfinite(r["loss"])
