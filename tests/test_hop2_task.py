"""Non-saturating aggregation-dependent synthetic task (figure15b role).

The planted-signal task saturates (99%+ by epoch 2) and cannot catch
aggregation bugs; ``plant_hop2_task`` labels by the 2-hop token majority
with label noise, exposing only one noisy token per node feature-side.  The
discrimination contract: a working GNN beats the feature-only MLP control by
a wide margin and plateaus BELOW 100%.
"""

import numpy as np
import pytest

from xgnn_tpu import RunConfig, synthetic
from xgnn_tpu.engine import Engine


@pytest.fixture(scope="module")
def hop2_ds():
    ds = synthetic.make_synthetic_dataset(
        num_node=20000, avg_degree=8, feat_dim=32, num_class=8, seed=3,
        planted_signal=1.0, train_frac=0.5,
    )
    return synthetic.plant_hop2_task(ds, seed=4)


def _train(ds, model, num_layer=3, epochs=3):
    config = RunConfig(
        batch_size=512,
        fanout=(5,) * num_layer,
        num_layer=num_layer,
        num_hidden=64,
        num_epoch=epochs,
        model=model,
        sample_type="khop3",
        cache_percentage=0.0,
        pipeline=False,
        lr=0.01,
        dropout=0.1,
        calibration_batches=2,
        root_path="/tmp",
    )
    engine = Engine(ds, config).init()
    for e in range(epochs):
        r = engine.train_epoch(e)
    assert np.isfinite(r["loss"])
    return engine.evaluate("valid", max_batches=8)


def test_gnn_beats_mlp_and_does_not_saturate(hop2_ds):
    acc_sage = _train(hop2_ds, "graphsage")
    acc_mlp = _train(hop2_ds, "mlp")
    # separation: the verdict's >= 10-point contract (typically ~40 here)
    assert acc_sage - acc_mlp >= 0.10, (acc_sage, acc_mlp)
    # non-saturating: the label-noise ceiling is ~0.86
    assert acc_sage < 0.95, acc_sage
    assert acc_sage > 0.55, acc_sage
