"""Full-neighbor accuracy evaluation of a trained checkpoint.

Analog of the reference's independent accuracy harness
(``example/samgraph/train_accuracy.py``): loads a checkpoint written by
``examples/train.py --checkpoint-dir`` and evaluates valid/test accuracy by
exact layer-wise full-graph inference (no sampling noise).

Usage:
  python examples/accuracy.py --synthetic --model graphsage \\
      --checkpoint-dir /tmp/ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("xgnn_tpu full-graph accuracy")
    p.add_argument("--model", default="graphsage", choices=["graphsage", "gcn", "gat", "pinsage"])
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--root-path", default="/graph-learning/samgraph/")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-nodes", type=int, default=100_000)
    p.add_argument("--num-hidden", type=int, default=256)
    p.add_argument("--fanout", nargs="+", type=int, default=[15, 10, 5])
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cpu", action="store_true",
                   help="run inference on CPU (matches train.py --cpu)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from xgnn_tpu import RunConfig
    from xgnn_tpu.checkpoint import CheckpointManager
    from xgnn_tpu.inference import evaluate_full
    from xgnn_tpu.models import build_model
    from xgnn_tpu.train import TrainState

    if args.synthetic or args.dataset == "synthetic":
        from xgnn_tpu import synthetic

        ds = synthetic.make_synthetic_dataset(
            num_node=args.synthetic_nodes, avg_degree=15, feat_dim=128,
            num_class=32, planted_signal=1.5, seed=args.seed,
        )
    else:
        from xgnn_tpu import load_dataset

        ds = load_dataset(os.path.join(args.root_path, args.dataset))

    config = RunConfig(
        model=args.model, num_hidden=args.num_hidden,
        num_layer=len(args.fanout), fanout=tuple(args.fanout),
        root_path="/tmp",
    )
    model = build_model(config, ds.feat_dim, ds.num_class)

    # restore: structure comes from a template init on a dummy block
    import jax
    import numpy as np

    from xgnn_tpu.constants import EMPTY_KEY
    from xgnn_tpu.types import Block

    dummy = Block(
        neigh=jnp.full((4, 2), EMPTY_KEY, jnp.int32),
        num_dst=jnp.int32(1), num_src=jnp.int32(1),
    )
    x0 = jnp.zeros((4, ds.feat_dim), jnp.float32)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        [dummy] * config.num_layer, x0, False,
    )["params"]
    from xgnn_tpu.train import make_optimizer

    tx = make_optimizer(config)
    template = TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(args.checkpoint_dir)
    state, extra = mgr.restore(template)
    if state is None:
        print("no checkpoint found", file=sys.stderr)
        sys.exit(1)

    indptr, indices = jnp.asarray(ds.indptr), jnp.asarray(ds.indices)
    feat = jnp.asarray(np.asarray(ds.feat))
    for split, nodes in (("valid", ds.valid_set), ("test", ds.test_set)):
        if len(nodes) == 0:
            continue
        acc = evaluate_full(
            model, state.params, indptr, indices, feat, ds.label, nodes
        )
        print(f"test_result:full_{split}_acc={acc:.4f}")


if __name__ == "__main__":
    main()
