"""Time-to-accuracy curve (reference Figure 15b analog,
``evaluation/figure15b/run.sh`` — GraphSAGE with ``--report-acc``):
validation accuracy vs training walltime, one row per epoch.

Usage: python evaluation/time_to_acc/run.py [--cpu] [--nodes N] [--epochs E]
Appends rows to results.tsv: mode, epoch, walltime_s, valid_acc, train_acc.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--degree", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--cache-percentage", type=float, default=0.0)
    ap.add_argument("--device-loop", action="store_true", default=False)
    # hop2: the NON-saturating 2-hop-majority task (round-5; the
    # planted-signal task hits 99% by epoch 2 and discriminates nothing).
    # --model mlp is the feature-only control the separation is measured
    # against (reference figure15b's DGL-baseline role).
    ap.add_argument("--task", choices=["planted", "hop2"], default="hop2")
    ap.add_argument("--model", default="graphsage")
    ap.add_argument("--label-noise", type=float, default=0.15)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from xgnn_tpu import RunConfig, synthetic
    from xgnn_tpu.engine import Engine

    ds = synthetic.make_synthetic_dataset(
        num_node=args.nodes, avg_degree=args.degree, feat_dim=64,
        num_class=16, planted_signal=0.25, train_frac=0.2, seed=0,
    )
    if args.task == "hop2":
        synthetic.plant_hop2_task(ds, label_noise=args.label_noise, seed=1)
    config = RunConfig(
        batch_size=args.batch_size, fanout=(10, 5), num_layer=2,
        num_hidden=128, model=args.model, sample_type="khop3",
        cache_percentage=args.cache_percentage,
        cache_policy="pre_sample",
        num_epoch=args.epochs, root_path="/tmp", pipeline=True,
        device_loop=args.device_loop,
    )
    eng = Engine(ds, config).init()
    mode = "cpu" if args.cpu else "tpu"
    if args.device_loop:
        mode += "_dloop"
    if args.task == "hop2":
        mode += f"_hop2_{args.model}"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.tsv"
    )
    new = not os.path.isfile(out)
    rows = []
    t_start = time.perf_counter()
    for epoch in range(args.epochs):
        r = eng.train_epoch(epoch)
        wall = time.perf_counter() - t_start
        acc = eng.evaluate("valid", max_batches=5)
        rows.append((epoch, wall, acc, r["train_acc"]))
        print(
            f"test_result:tta:{epoch}={wall:.2f}s valid_acc={acc:.4f}",
            flush=True,
        )
    with open(out, "a") as f:
        if new:
            f.write("# mode\tepoch\twalltime_s\tvalid_acc\ttrain_acc\tconfig\n")
        for e, w, a, ta in rows:
            f.write(
                f"{mode}\t{e}\t{w:.2f}\t{a:.4f}\t{ta:.4f}\t"
                f"nodes={args.nodes} batch={args.batch_size} "
                f"cache={args.cache_percentage}\n"
            )
    print(f"# appended {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
