"""Checkpoint/resume: exact state round-trip and engine resume."""

import numpy as np
import pytest

from xgnn_tpu import RunConfig
from xgnn_tpu.engine import Engine


def test_engine_checkpoint_resume(learnable_or_small, tmp_path):
    ds = learnable_or_small
    common = dict(
        batch_size=128, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", num_epoch=2, cache_percentage=0.0,
        pipeline=False, calibration_batches=1, root_path="/tmp",
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=1,
    )
    e1 = Engine(ds, RunConfig(**common))
    r1 = e1.run()
    step_after = int(e1.state.step)
    assert step_after > 0

    # resume: same dir, more epochs — must restore and continue, not restart
    common2 = dict(common, num_epoch=3)
    e2 = Engine(ds, RunConfig(**common2))
    r2 = e2.run()
    # only epoch 2 should have been trained in the second run
    assert len(r2["epochs"]) == 1
    assert r2["epochs"][0]["epoch"] == 2
    assert int(e2.state.step) > step_after

    # restored params equal saved params at the restore point
    from xgnn_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(common["checkpoint_dir"])
    state, extra = mgr.restore(e2.state)
    assert extra["epoch"] == 2
    mgr.close()


def test_multi_chip_checkpoint_resume(small_ds, tmp_path):
    """Replicated-state checkpoint round-trip through Orbax on the mesh:
    restore must re-replicate and continue from the saved epoch."""
    from xgnn_tpu.engine.multi_engine import MultiChipEngine

    common = dict(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", num_worker=4,
        use_dist_graph=True, part_cache=True, cache_percentage=1.0,
        num_epoch=2, lr=0.01, root_path="/tmp",
        checkpoint_dir=str(tmp_path / "mc_ckpt"), checkpoint_every=1,
    )
    e1 = MultiChipEngine(small_ds, RunConfig(**common))
    r1 = e1.run()
    assert len(r1["epochs"]) == 2

    e2 = MultiChipEngine(small_ds, RunConfig(**dict(common, num_epoch=3)))
    r2 = e2.run()
    # only epoch 2 trains in the resumed run
    assert len(r2["epochs"]) == 1
    assert r2["epochs"][0]["epoch"] == 2
    assert np.isfinite(r2["epochs"][0]["loss"])


def test_disagg_checkpoint_resume(small_ds, tmp_path):
    from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

    common = dict(
        batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
        model="graphsage", sample_type="khop3", lr=0.01, root_path="/tmp",
        num_sample_worker=1, num_train_worker=1, arch="disaggregated",
        num_epoch=2, pipeline=False,
        checkpoint_dir=str(tmp_path / "dg_ckpt"), checkpoint_every=1,
    )
    e1 = DisaggregatedEngine(small_ds, RunConfig(**common))
    r1 = e1.run()
    assert len(r1["epochs"]) == 2

    e2 = DisaggregatedEngine(small_ds, RunConfig(**dict(common, num_epoch=3)))
    r2 = e2.run()
    assert len(r2["epochs"]) == 1
    assert r2["epochs"][0]["epoch"] == 2
    assert np.isfinite(r2["epochs"][0]["loss"])


@pytest.fixture()
def learnable_or_small(small_ds):
    return small_ds
