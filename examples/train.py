"""Train a GNN with xgnn_tpu — the CLI analog of the reference training
scripts (``example/samgraph/sgnn/train_{gcn,graphsage,pinsage}.py``).

One script covers the model zoo (``--model``) and the sampling/cache
configuration surface; prints the ``config:`` and ``test_result:`` stdout
protocol consumed by the evaluation harness.

Examples:
  python examples/train.py --synthetic --model graphsage --num-epoch 3
  python examples/train.py --root-path /data --dataset products \\
      --model gcn --cache-policy pre_sample --cache-percentage 0.2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser("xgnn_tpu training")
    p.add_argument("--model", default="graphsage",
                   choices=["graphsage", "gcn", "gat", "pinsage"])
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--root-path", default="/graph-learning/samgraph/")
    p.add_argument("--synthetic", action="store_true",
                   help="use an in-memory synthetic graph (no dataset dir)")
    p.add_argument("--synthetic-nodes", type=int, default=100_000)
    p.add_argument("--synthetic-degree", type=int, default=15)
    p.add_argument("--synthetic-signal", type=float, default=1.5,
                   help="label-homophily signal strength; 0 = pure power law")
    p.add_argument("--synthetic-rmat", action="store_true",
                   help="RMAT generator (heavier degree skew)")
    p.add_argument("--sample-type", default="khop3",
                   choices=["khop0", "khop1", "khop2", "khop3",
                            "weighted_khop", "weighted_khop_prefix",
                            "weighted_khop_hash_dedup", "random_walk"])
    p.add_argument("--fanout", nargs="+", type=int, default=[15, 10, 5])
    p.add_argument("--batch-size", type=int, default=8000)
    p.add_argument("--num-epoch", type=int, default=10)
    p.add_argument("--num-hidden", type=int, default=256)
    p.add_argument("--num-head", type=int, default=1,
                   help="GAT attention heads (hidden layers)")
    p.add_argument("--lr", type=float, default=0.003)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--cache-policy", default="pre_sample",
                   choices=["degree", "heuristic", "pre_sample", "degree_hop",
                            "presample_static", "fake_optimal",
                            "dynamic_cache", "random"])
    p.add_argument("--cache-percentage", type=float, default=0.0)
    p.add_argument("--presample-epoch", type=int, default=1)
    p.add_argument("--num-worker", type=int, default=1,
                   help="data-parallel chips (arch6 mode when > 1)")
    p.add_argument("--num-sample-worker", type=int, default=0,
                   help="dedicated sampler chips (arch5/FGNN mode when > 0)")
    p.add_argument("--num-train-worker", type=int, default=1,
                   help="data-parallel trainer chips in arch5 mode")
    p.add_argument("--num-dcn-groups", type=int, default=1,
                   help="hierarchical mesh groups: the GGMS store shards "
                        "over num_worker/groups chips (ICI) and replicates "
                        "across groups (DCN) — the PartitionSolver-analog "
                        "placement")
    p.add_argument("--use-dist-graph", action="store_true", default=False,
                   help="partition the topology across chips (GGMS)")
    p.add_argument("--dist-graph-percentage", type=float, default=1.0,
                   help="edge fraction resident on device; rest served from "
                        "the host-RAM cold tier (reference "
                        "dist_graph_percentage)")
    p.add_argument("--part-cache", action="store_true", default=False)
    p.add_argument("--auto-placement", action="store_true", default=False,
                   help="solve dist_graph_percentage/cache_percentage from "
                        "the per-chip HBM budget + degree skew "
                        "(PartitionSolver analog, parallel/placement.py)")
    p.add_argument("--hbm-budget-gb", type=float, default=None,
                   help="per-chip HBM override for --auto-placement")
    p.add_argument("--pipeline", action="store_true", default=False)
    p.add_argument("--no-pipeline", dest="pipeline", action="store_false")
    p.add_argument("--device-loop", action="store_true", default=False,
                   help="fuse the whole epoch into one lax.scan device "
                        "program (all-HBM feature path only; zero host "
                        "dispatches between steps)")
    p.add_argument("--report-acc", type=int, default=0)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--validate-configs", action="store_true",
                   help="exit after printing the resolved config")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("-pl", "--profile-level", type=int, default=0,
                   help="profiler verbosity 0-3 (reference -pl)")
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="bounded prefetch queue depth (reference "
                        "--max-sampling-jobs/--max-copying-jobs analog)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the TPU untouched)")
    p.add_argument("--gpu-extract", dest="gpu_extract", action="store_true",
                   default=True,
                   help="direct in-device feature extraction (the reference "
                        "--gpu-extract read-through): the last layer keeps "
                        "global ids and the model gathers features straight "
                        "from the HBM table, skipping the final dedup+extract "
                        "stage (default on; off when the store is tiered)")
    p.add_argument("--no-gpu-extract", dest="gpu_extract",
                   action="store_false")
    p.add_argument("--agg-impl", default=None, choices=["loop", "tiled"],
                   help="fanout-aggregation formulation (see PERF.md)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize GNN layers in backward "
                        "(jax.checkpoint): fit big frontiers in HBM")
    p.add_argument("--feat-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="on-device feature-table storage dtype")
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="model activation dtype; bfloat16 routes matmuls "
                        "through the bf16 MXU path with f32 accumulation")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        # virtual devices must be requested before the backend initializes:
        # --cpu with N workers gives an N-device virtual mesh (same
        # mechanism as tests/conftest.py)
        need = max(
            args.num_worker, args.num_sample_worker + args.num_train_worker
        )
        if need > 1:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={need}"
            )
        import jax

        jax.config.update("jax_platforms", "cpu")
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine

    if args.sample_type == "random_walk" and args.model != "pinsage":
        print("warning: random_walk sampling is the pinsage path; "
              "forcing --model pinsage", file=sys.stderr)
        args.model = "pinsage"
    if args.model == "pinsage":
        args.sample_type = "random_walk"

    extra = {}
    if args.agg_impl is not None:
        extra["agg_impl"] = args.agg_impl
    if args.feat_dtype is not None:
        extra["feat_dtype"] = args.feat_dtype
    if args.compute_dtype is not None:
        extra["compute_dtype"] = args.compute_dtype
    config = RunConfig(
        model=args.model,
        dataset=args.dataset,
        root_path=args.root_path,
        **extra,
        sample_type=args.sample_type,
        fanout=tuple(args.fanout),
        num_layer=len(args.fanout),
        batch_size=args.batch_size,
        num_epoch=args.num_epoch,
        num_hidden=args.num_hidden,
        num_head=args.num_head,
        lr=args.lr,
        dropout=args.dropout,
        num_worker=args.num_worker,
        num_dcn_groups=args.num_dcn_groups,
        num_sample_worker=max(args.num_sample_worker, 1),
        num_train_worker=args.num_train_worker,
        arch=("disaggregated" if args.num_sample_worker > 0
              else "collocated" if args.num_worker > 1 else "single"),
        use_dist_graph=args.use_dist_graph,
        dist_graph_percentage=args.dist_graph_percentage,
        part_cache=args.part_cache,
        auto_placement=args.auto_placement,
        hbm_budget_gb=args.hbm_budget_gb,
        cache_policy=args.cache_policy,
        cache_percentage=args.cache_percentage,
        presample_epoch=args.presample_epoch,
        pipeline=args.pipeline,
        gpu_extract=args.gpu_extract,
        device_loop=args.device_loop,
        remat=args.remat,
        report_acc=args.report_acc,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        seed=args.seed,
        profile_level=args.profile_level,
        prefetch_depth=args.prefetch_depth,
    )
    config.print_run_config()
    if args.validate_configs:
        return

    if args.synthetic or args.dataset == "synthetic":
        from xgnn_tpu import synthetic

        ds = synthetic.make_synthetic_dataset(
            num_node=args.synthetic_nodes,
            avg_degree=args.synthetic_degree,
            feat_dim=128,
            num_class=32,
            planted_signal=args.synthetic_signal,
            power_law="rmat" if args.synthetic_rmat else True,
            seed=args.seed,
        )
        if args.sample_type.startswith("weighted"):
            synthetic.build_alias_tables(ds)
    else:
        from xgnn_tpu import load_dataset

        ds = load_dataset(config.dataset_path)

    from xgnn_tpu.config import RunArch

    if config.arch == RunArch.DISAGGREGATED:
        from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine

        engine = DisaggregatedEngine(ds, config)
    elif config.num_worker > 1:
        from xgnn_tpu.engine.multi_engine import MultiChipEngine

        engine = MultiChipEngine(ds, config)
    else:
        engine = Engine(ds, config)
    engine.run()
    if args.report_acc:
        # sidecar test accuracy (reference train_accuracy.py analog) —
        # every engine exposes evaluate()
        acc = engine.evaluate("test")
        print(f"test_result:test_acc={acc:.4f}")


if __name__ == "__main__":
    main()
