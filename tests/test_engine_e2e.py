"""End-to-end engine tests: the full sample→extract→train pipeline learns on
a planted-signal synthetic graph (the accuracy-parity strategy of SURVEY §4
adapted to an egress-free environment)."""

import numpy as np
import pytest

from xgnn_tpu import RunConfig
from xgnn_tpu.engine import Engine
from xgnn_tpu import synthetic


@pytest.fixture(scope="module")
def learnable_ds():
    return synthetic.make_synthetic_dataset(
        num_node=3000,
        avg_degree=8,
        feat_dim=32,
        num_class=5,
        seed=7,
        planted_signal=2.0,
        train_frac=0.3,
    )


@pytest.mark.parametrize("model", ["graphsage", "gcn"])
def test_training_learns(learnable_ds, model):
    config = RunConfig(
        batch_size=256,
        fanout=(5, 5),
        num_layer=2,
        num_hidden=32,
        num_epoch=3,
        model=model,
        sample_type="khop3",
        cache_percentage=0.0,
        pipeline=False,
        lr=0.01,
        dropout=0.1,
        calibration_batches=2,
        root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    r0 = engine.train_epoch(0)
    r_last = engine.train_epoch(1)
    r_last = engine.train_epoch(2)
    assert np.isfinite(r0["loss"]) and np.isfinite(r_last["loss"])
    assert r_last["loss"] < r0["loss"]
    assert r_last["train_acc"] > 0.5, r_last
    acc = engine.evaluate("valid", max_batches=2)
    assert acc > 0.4


def test_gat_multihead_learns(learnable_ds):
    """8-head GAT (the reference train_gat.py default) through the full
    engine: exercises the online-softmax aggregation end to end, including
    the forced non-agg-first paths (acc/mat limits shrunk via env)."""
    import os

    os.environ["XGNN_GAT_ACC_LIMIT"] = "1"  # force beyond-acc_limit paths
    try:
        config = RunConfig(
            batch_size=256,
            fanout=(5, 5),
            num_layer=2,
            num_hidden=32,
            num_head=8,
            num_epoch=3,
            model="gat",
            sample_type="khop3",
            cache_percentage=0.0,
            pipeline=False,
            lr=0.01,
            dropout=0.1,
            calibration_batches=2,
            root_path="/tmp",
        )
        engine = Engine(learnable_ds, config).init()
        r0 = engine.train_epoch(0)
        engine.train_epoch(1)
        r_last = engine.train_epoch(2)
        assert np.isfinite(r0["loss"]) and np.isfinite(r_last["loss"])
        assert r_last["loss"] < r0["loss"]
        assert r_last["train_acc"] > 0.5, r_last
    finally:
        del os.environ["XGNN_GAT_ACC_LIMIT"]


def test_pipeline_matches_sync(learnable_ds):
    common = dict(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=16,
        num_epoch=1, model="graphsage", cache_percentage=0.0,
        lr=0.01, calibration_batches=1, root_path="/tmp",
    )
    e_sync = Engine(learnable_ds, RunConfig(pipeline=False, **common)).init()
    e_pipe = Engine(learnable_ds, RunConfig(pipeline=True, **common)).init()
    r_sync = e_sync.train_epoch(0)
    r_pipe = e_pipe.train_epoch(0)
    # same seeds, same math — pipelining must not change results
    np.testing.assert_allclose(r_sync["loss"], r_pipe["loss"], rtol=1e-4)


def test_device_loop_matches_host_loop(learnable_ds):
    """The fused lax.scan epoch (device_loop) replicates the host loop's
    key folding and shuffle order, so its per-epoch metrics must match the
    host-driven loop bit-for-bit (up to float reassociation)."""
    common = dict(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=16,
        num_epoch=2, model="graphsage", cache_percentage=0.0,
        lr=0.01, dropout=0.1, calibration_batches=1, root_path="/tmp",
        pipeline=False,
    )
    e_host = Engine(learnable_ds, RunConfig(device_loop=False, **common)).init()
    e_dev = Engine(learnable_ds, RunConfig(device_loop=True, **common)).init()
    for epoch in range(2):
        r_host = e_host.train_epoch(epoch)
        r_dev = e_dev.train_epoch(epoch)
        np.testing.assert_allclose(r_host["loss"], r_dev["loss"], rtol=1e-4)
        np.testing.assert_allclose(
            r_host["train_acc"], r_dev["train_acc"], rtol=1e-4
        )
    # the non-direct path (gcn extracts by frontier ids) also fuses
    e_gcn = Engine(
        learnable_ds,
        RunConfig(device_loop=True, **{**common, "model": "gcn"}),
    ).init()
    assert np.isfinite(e_gcn.train_epoch(0)["loss"])


def test_remat_matches_plain(learnable_ds):
    """jax.checkpoint layers recompute the SAME math — loss must match the
    non-remat run exactly."""
    common = dict(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=16,
        num_epoch=1, model="gcn", cache_percentage=0.0,
        lr=0.01, dropout=0.1, calibration_batches=1, root_path="/tmp",
        pipeline=False,
    )
    e_plain = Engine(learnable_ds, RunConfig(remat=False, **common)).init()
    e_remat = Engine(learnable_ds, RunConfig(remat=True, **common)).init()
    r_plain = e_plain.train_epoch(0)
    r_remat = e_remat.train_epoch(0)
    np.testing.assert_allclose(r_plain["loss"], r_remat["loss"], rtol=1e-4)


def test_device_loop_overflow_grows(learnable_ds):
    """Sampler-capacity overflow inside the fused epoch must be flagged,
    skip the update on device, and grow capacities at epoch end."""
    config = RunConfig(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=16,
        num_epoch=2, model="graphsage", cache_percentage=0.0,
        pipeline=False, device_loop=True, root_path="/tmp",
        frontier_capacities=(256, 320, 320),  # far below the real frontier
    )
    engine = Engine(learnable_ds, config).init()
    engine.train_epoch(0)
    assert engine.sampler.capacities[-1] > 320
    assert np.isfinite(engine.train_epoch(1)["loss"])


def test_tiered_cache_e2e():
    # pure power-law graph (no homophily rewire): presample ranking must
    # exploit the degree skew
    skewed_ds = synthetic.make_synthetic_dataset(
        num_node=3000, avg_degree=8, feat_dim=32, num_class=5, seed=11,
        train_frac=0.3, power_law="rmat",
    )
    config = RunConfig(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=16,
        num_epoch=1, model="graphsage", sample_type="khop3",
        cache_policy="pre_sample", cache_percentage=0.2, presample_epoch=1,
        pipeline=False, calibration_batches=1, root_path="/tmp",
    )
    engine = Engine(skewed_ds, config).init()
    from xgnn_tpu.store.feature_store import TieredFeatureSource

    assert isinstance(engine.feature_source, TieredFeatureSource)
    r = engine.train_epoch(0)
    assert np.isfinite(r["loss"])
    hit = engine.profiler.step_average  # warm-up epoch excluded -> use raw
    hits = [
        v["cache_hit_rate"]
        for v in engine.profiler._step_items.values()
        if "cache_hit_rate" in v
    ]
    # presample ranking on a power-law graph should beat the 20% cache size
    assert np.mean(hits) > 0.3, np.mean(hits)


def test_sync_free_miss_bucket_overflow_grows(learnable_ds):
    """A too-small fixed miss bucket must (a) flag overflow, (b) skip the
    poisoned updates on device, (c) grow the bucket at epoch end — the
    sync-free analog of the reference's capacity-grow-and-retry."""
    config = RunConfig(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=16,
        num_epoch=2, model="graphsage", sample_type="khop3",
        cache_policy="degree", cache_percentage=0.2,
        pipeline=False, calibration_batches=1, root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    # sabotage: shrink the bucket far below the real miss count
    engine.feature_source.miss_cap = 128
    r0 = engine.train_epoch(0)
    grown = engine.feature_source.miss_cap
    assert grown > 128, "bucket must grow after an overflowed epoch"
    # overflowed steps are skipped (nan loss slots excluded by nanmean) but
    # the epoch completes and a second epoch trains with the grown bucket
    r1 = engine.train_epoch(1)
    assert np.isfinite(r1["loss"])


def test_pinsage_e2e(learnable_ds):
    config = RunConfig(
        batch_size=128, num_hidden=16, num_epoch=1, model="pinsage",
        sample_type="random_walk", num_neighbor=4, num_layer_pinsage=2,
        num_random_walk=4, random_walk_length=3,
        cache_percentage=0.0, pipeline=False, calibration_batches=1,
        root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    r = engine.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_sanity_check_mode(learnable_ds):
    config = RunConfig(
        batch_size=64, fanout=(3, 3), num_layer=2, num_hidden=8,
        model="graphsage", num_epoch=1, cache_percentage=0.0,
        pipeline=False, calibration_batches=1, sanity_check=True,
        root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    r = engine.train_epoch(0)  # must not raise
    assert np.isfinite(r["loss"])


def test_node_access_log(learnable_ds):
    config = RunConfig(
        batch_size=64, fanout=(3, 3), num_layer=2, num_hidden=8,
        model="graphsage", num_epoch=1, cache_percentage=0.0,
        pipeline=False, calibration_batches=1, root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    engine.profiler.enable_node_access_log()
    engine.train_epoch(0)
    freq = engine.profiler.node_access_frequency()
    assert len(freq) > 0
    assert freq[0][1] >= freq[-1][1]  # sorted by count desc


def test_dynamic_cache_refresh():
    skewed = synthetic.make_synthetic_dataset(
        num_node=2000, avg_degree=6, feat_dim=16, num_class=4, seed=13,
        train_frac=0.3, power_law="rmat",
    )
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        num_epoch=2, model="graphsage", sample_type="khop3",
        cache_policy="dynamic_cache", cache_percentage=0.2, presample_epoch=1,
        pipeline=False, calibration_batches=1, root_path="/tmp",
    )
    engine = Engine(skewed, config).init()
    from xgnn_tpu.store.feature_store import DynamicTieredFeatureSource

    assert isinstance(engine.feature_source, DynamicTieredFeatureSource)
    old_posmap = np.asarray(engine.feature_source.posmap).copy()
    r0 = engine.train_epoch(0)
    r1 = engine.train_epoch(1)
    assert np.isfinite(r0["loss"]) and np.isfinite(r1["loss"])
    # extraction still correct after refresh: spot-check a batch
    import jax.numpy as _jnp
    from xgnn_tpu.constants import EMPTY_KEY as _EK

    ids = np.full(64, _EK, np.int32)
    ids[:32] = np.arange(32)
    out, _ = engine.feature_source.extract(_jnp.asarray(ids), 32)
    np.testing.assert_allclose(
        np.asarray(out)[:32], skewed.feat[:32], rtol=1e-6
    )


def test_bfloat16_compute(learnable_ds):
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", num_epoch=1, cache_percentage=0.0,
        pipeline=False, calibration_batches=1, compute_dtype="bfloat16",
        lr=0.01, root_path="/tmp",
    )
    import jax.numpy as jnp
    engine = Engine(learnable_ds, config, feat_dtype=jnp.bfloat16).init()
    r = engine.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_prefetcher_propagates_failures():
    """Failure-detection parity (SURVEY §5.3): a crash in the background
    sample/extract worker must surface in the training loop, like the
    reference's waitpid child supervision."""
    from xgnn_tpu.engine.pipeline import Prefetcher

    def boom(item):
        if item == 3:
            raise RuntimeError("worker died")
        return item * 2

    pf = Prefetcher(iter(range(10)), boom, depth=2)
    got = []
    with pytest.raises(RuntimeError, match="worker died"):
        for x in pf:
            got.append(x)
    assert got == [0, 2, 4]
    pf.close()


def test_fake_optimal_cache_policy():
    skewed = synthetic.make_synthetic_dataset(
        num_node=2000, avg_degree=6, feat_dim=16, num_class=4, seed=17,
        train_frac=0.3, power_law="rmat",
    )
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        num_epoch=1, model="graphsage", cache_policy="fake_optimal",
        cache_percentage=0.2, pipeline=False, calibration_batches=1,
        root_path="/tmp",
    )
    engine = Engine(skewed, config).init()
    r = engine.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_presample_static_policy(learnable_ds):
    """presample_static: frequency ranking over the all-neighbor expansion
    (reference DoGPUSampleAllNeighbour via cuda/pre_sampler.cc:69-74)."""
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", num_epoch=1,
        cache_policy="presample_static", cache_percentage=0.2,
        presample_static_fanout=8, lr=0.01, root_path="/tmp",
    )
    eng = Engine(learnable_ds, config).init()
    assert eng.feature_source.num_cache > 0
    r = eng.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_bf16_feature_storage_learns(learnable_ds):
    """feat_dtype="bfloat16" (half the gather bytes) still learns; also
    exercised with the tiled aggregation and the tiered store."""
    common = dict(
        batch_size=256, fanout=(5, 5), num_layer=2, num_hidden=32,
        num_epoch=3, model="graphsage", sample_type="khop3",
        lr=0.01, dropout=0.1, calibration_batches=2, root_path="/tmp",
        pipeline=False, feat_dtype="bfloat16", agg_impl="tiled",
    )
    for cache in (0.0, 0.2):
        cfg = RunConfig(
            cache_percentage=cache,
            cache_policy="degree" if cache else "pre_sample",
            **common,
        )
        engine = Engine(learnable_ds, cfg).init()
        if cache == 0.0:
            import jax.numpy as jnp

            assert engine.feature_source.feat.dtype == jnp.bfloat16
        r0 = engine.train_epoch(0)
        r2 = None
        for e in (1, 2):
            r2 = engine.train_epoch(e)
        assert np.isfinite(r2["loss"])
        assert r2["loss"] < r0["loss"]
        assert r2["train_acc"] > 0.5, (cache, r2)


def test_single_chip_tiered_topology(learnable_ds):
    """Out-of-core topology on ONE chip (reference single-GPU large-graph
    mode, evaluation/large_graph --use-dist-graph 0.85): only the hot edge
    prefix lives on device; cold frontier nodes draw from the host CSR via
    the batched callback.  Training must learn and every cold node's picks
    must be its real neighbors."""
    import dataclasses

    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        num_epoch=8, model="graphsage", sample_type="khop3",
        use_dist_graph=True, dist_graph_percentage=0.5,
        pipeline=False, calibration_batches=1, lr=0.05, dropout=0.0,
        root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    assert engine._tier is not None
    ncn = engine._tier[0]
    assert 0 < ncn < learnable_ds.num_node
    assert engine.graph.num_node == ncn  # only the prefix is device-resident
    accs = [engine.train_epoch(e)["train_acc"] for e in range(8)]
    assert all(np.isfinite(a) for a in accs)
    assert max(accs) > 0.6, accs

    # draw correctness: sample one batch, verify every pick (hot AND cold)
    # is a true neighbor in the FULL graph
    import jax
    import jax.numpy as jnp

    from xgnn_tpu.constants import EMPTY_KEY

    seeds = np.full(engine.sampler.capacities[0], EMPTY_KEY, np.int32)
    take = min(64, len(learnable_ds.train_set))
    seeds[:take] = learnable_ds.train_set[:take]
    batch = engine.sampler.sample(jnp.asarray(seeds), take, jax.random.key(5))
    # the direct-extract layer (global ids + dst_ids) is the OUTERMOST
    # block after the DGL-order reverse
    blk = batch.blocks[0]
    assert blk.dst_ids is not None
    neigh = np.asarray(blk.neigh)
    dst = np.asarray(blk.dst_ids)
    ndst = int(blk.num_dst)
    indptr, indices = learnable_ds.indptr, learnable_ds.indices
    checked_cold = 0
    for i in range(ndst):
        v = int(dst[i])
        if v == EMPTY_KEY:
            continue
        row = set(indices[indptr[v]:indptr[v + 1]].tolist())
        picks = [int(x) for x in neigh[i] if x != EMPTY_KEY]
        assert set(picks) <= row, (v, picks, row)
        if v >= ncn:
            checked_cold += 1
    # the 0.5 edge split leaves plenty of cold train nodes
    assert checked_cold > 0


def test_disagg_tiered_topology(learnable_ds):
    """arch5 with tiered sampler topology: sampler chips hold only the hot
    prefix + host cold tier (VERDICT round-2 weak 9)."""
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        num_epoch=2, model="graphsage", sample_type="khop3",
        num_sample_worker=2, num_train_worker=2, num_worker=4,
        use_dist_graph=True, dist_graph_percentage=0.5,
        pipeline=False, calibration_batches=1, lr=0.05, root_path="/tmp",
    )
    eng = DisaggregatedEngine(learnable_ds, config).init()
    for s in eng.svc.samplers:
        assert s.tier is not None
        assert s.graph.num_node < learnable_ds.num_node
    r = eng.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_single_chip_tiered_pinsage(learnable_ds):
    """Out-of-core PinSAGE on one chip: walkers standing on cold nodes step
    through the host CSR callback (tier threaded through every walk step)."""
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        num_epoch=6, model="pinsage", sample_type="random_walk",
        num_random_walk=4, random_walk_length=3,
        random_walk_restart_prob=0.5, num_neighbor=4,
        use_dist_graph=True, dist_graph_percentage=0.5,
        pipeline=False, calibration_batches=1, lr=0.05, dropout=0.0,
        root_path="/tmp",
    )
    engine = Engine(learnable_ds, config).init()
    assert engine._tier is not None
    assert engine.graph.num_node < learnable_ds.num_node
    accs = [engine.train_epoch(e)["train_acc"] for e in range(6)]
    assert all(np.isfinite(a) for a in accs)
    assert max(accs) > 0.5, accs


def test_single_chip_tiered_weighted_prefix(learnable_ds):
    """Out-of-core topology x weighted-prefix sampling: the hot prefix
    carries sliced prob_prefix tables (+ coarse CDF) and cold nodes draw
    through the host prefix-search path."""
    from xgnn_tpu import synthetic

    ds = learnable_ds
    if getattr(ds, "prob_prefix_table", None) is None:
        synthetic.build_alias_tables(ds)
    config = RunConfig(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        num_epoch=4, model="graphsage", sample_type="weighted_khop_prefix",
        use_dist_graph=True, dist_graph_percentage=0.5,
        pipeline=False, calibration_batches=1, lr=0.05, root_path="/tmp",
    )
    eng = Engine(ds, config).init()
    assert eng._tier is not None
    accs = [eng.train_epoch(e)["train_acc"] for e in range(4)]
    assert max(accs) > 0.5, accs
