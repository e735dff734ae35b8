"""Disaggregated (arch5) role split: sampler chips feed a trainer chip."""

import jax
import jax.numpy as jnp
import numpy as np

from xgnn_tpu import RunConfig
from xgnn_tpu.constants import EMPTY_KEY
from xgnn_tpu.models import build_model
from xgnn_tpu.parallel.disaggregated import DisaggregatedSampler
from xgnn_tpu.store.feature_store import HBMFeatureSource, LabelSource
from xgnn_tpu.train import init_state, make_train_step


def test_sampler_trainer_split(small_ds):
    devs = jax.devices()
    assert len(devs) >= 3
    sample_devs, train_dev = devs[:2], devs[2]

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", lr=0.01, root_path="/tmp",
    )
    svc = DisaggregatedSampler(small_ds, config, sample_devs)
    feat_src = HBMFeatureSource(small_ds.feat, train_dev)
    lab_src = LabelSource(small_ds.label, train_dev)
    model = build_model(config, small_ds.feat_dim, small_ds.num_class)

    seeds = np.full(svc.capacities[0], EMPTY_KEY, np.int32)
    seeds[:64] = small_ds.train_set[:64]
    b0 = svc.sample_to(seeds, 64, jax.random.key(0), train_dev)
    # batch landed on the trainer device
    assert b0.input_nodes.devices() == {train_dev}

    x, _ = feat_src.extract(b0.input_nodes, b0.num_input)
    labels = lab_src.extract(b0.output_nodes, b0.num_output)
    state = init_state(model, config, b0.blocks, x, jax.random.key(1))
    step = make_train_step(model, config, donate=False)

    losses = []
    for i in range(4):  # round-robins across both sampler chips
        b = svc.sample_to(seeds, 64, jax.random.fold_in(jax.random.key(2), i),
                          train_dev)
        x, _ = feat_src.extract(b.input_nodes, b.num_input)
        labels = lab_src.extract(b.output_nodes, b.num_output)
        state, metrics = step(state, b.blocks, x, labels, b.num_output,
                              jax.random.key(3))
        losses.append(metrics["loss"])
    losses = np.asarray(jnp.stack(losses))
    assert np.all(np.isfinite(losses))
    assert int(state.step) == 4


def test_disagg_engine_2x2_learns(learn_ds):
    """2 sampler chips → 2 data-parallel trainer chips with a trainer-side
    tiered cache (reference arch5 multi-trainer DDP + DistCacheManager,
    dist_loops_arch5.cc:56-297) — VERDICT round-1 item 7."""
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=32,
        model="graphsage", sample_type="khop3", lr=0.01, root_path="/tmp",
        num_sample_worker=2, num_train_worker=2, arch="disaggregated",
        cache_percentage=0.3, cache_policy="degree", num_epoch=3,
        pipeline=True,
    )
    eng = DisaggregatedEngine(learn_ds, config).init()
    assert len(eng.feature_sources) == 2
    results = [eng.train_epoch(e) for e in range(3)]
    losses = [r["loss"] for r in results]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 0.9  # learns
    acc = eng.evaluate("valid", max_batches=2)
    assert np.isfinite(acc) and acc > 0.0


def test_disagg_overflow_grows(learn_ds):
    """Capacity overflow in the disaggregated pipeline must skip the
    poisoned updates and grow the sampling service for the next epoch."""
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", lr=0.01, root_path="/tmp",
        num_sample_worker=1, num_train_worker=1, arch="disaggregated",
        num_epoch=2, pipeline=False,
        frontier_capacities=(64, 128, 128),  # far below the real frontier
    )
    eng = DisaggregatedEngine(learn_ds, config).init()
    eng.train_epoch(0)
    assert eng.svc.capacities[-1] > 128
    assert np.isfinite(eng.train_epoch(1)["loss"])


def test_balance_switcher_rerole(learn_ds):
    """Epoch-boundary sampler/trainer re-role (balance_switcher analog,
    example/samgraph/balance_switcher/): state survives the re-role and
    training continues."""
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=32,
        model="graphsage", sample_type="khop3", lr=0.01, root_path="/tmp",
        num_sample_worker=2, num_train_worker=2, arch="disaggregated",
        num_epoch=3, pipeline=False, balance_switcher=True,
    )
    eng = DisaggregatedEngine(learn_ds, config).init()
    r0 = eng.train_epoch(0)
    step_before = int(np.asarray(jax.tree.leaves(eng.state.step)[0]))
    eng._rebalance(1, 3)  # shrink samplers, grow trainers
    assert len(eng.feature_sources) == 3
    assert len(eng.svc.devices) == 1
    step_after = int(np.asarray(jax.tree.leaves(eng.state.step)[0]))
    assert step_after == step_before  # optimizer state carried over
    r1 = eng.train_epoch(1)
    assert np.isfinite(r1["loss"])
    eng._rebalance(3, 1)  # and back the other way
    r2 = eng.train_epoch(2)
    assert np.isfinite(r2["loss"])


def test_disagg_engine_presample_cache(small_ds):
    """pre_sample cache policy rides sampler chip 0 (arch5 presample)."""
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", lr=0.01, root_path="/tmp",
        num_sample_worker=1, num_train_worker=1, arch="disaggregated",
        cache_percentage=0.2, cache_policy="pre_sample", presample_epoch=1,
        num_epoch=1, pipeline=False,
    )
    eng = DisaggregatedEngine(small_ds, config).init()
    r = eng.train_epoch(0)
    assert np.isfinite(r["loss"])


def test_disagg_role_degenerate_one_device(learn_ds):
    """arch5 with 1 sampler + 1 trainer role sharing ONE chip (the single
    chip benchmark shape, XGNN_BENCH_ARCH5): the full pipeline runs, the
    D2D handoff degenerates to an on-chip no-op."""
    import jax

    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    config = RunConfig(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", num_sample_worker=1, num_train_worker=1,
        cache_percentage=0.0, num_epoch=2, lr=0.01, root_path="/tmp",
        pipeline=True,
    )
    eng = DisaggregatedEngine(
        learn_ds, config, devices=jax.devices()[:1]
    ).init()
    assert eng.sample_devices[0] is eng.train_devices[0]
    losses = [eng.train_epoch(e)["loss"] for e in range(2)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    acc = eng.evaluate("valid", max_batches=2)
    assert np.isfinite(acc)
