"""Multi-chip scaling (reference Figure 13 analog): epoch time / edges-per-sec
scaling efficiency at 1..N workers with the collocated SPMD engine.

On a real TPU slice this reports ICI-scaling of the full pipeline; under
`--cpu-mesh` it runs on the virtual device mesh (structural validation +
step-count accounting, not hardware bandwidth).

Usage: python evaluation/scaling/run.py [--cpu-mesh] [--workers 1 2 4 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true")
    ap.add_argument("--workers", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count="
            + str(max(args.workers))
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from xgnn_tpu import RunConfig, synthetic
    from xgnn_tpu.engine.multi_engine import MultiChipEngine

    ds = synthetic.make_synthetic_dataset(
        num_node=args.nodes, avg_degree=15, feat_dim=128, num_class=32,
        seed=0,
    )
    rows = []
    for w in args.workers:
        if w > len(jax.devices()):
            print(f"# skipping {w} workers (only {len(jax.devices())} devices)")
            continue
        config = RunConfig(
            batch_size=args.batch_size, fanout=(10, 5), num_layer=2,
            num_hidden=128, model="graphsage", num_worker=w,
            use_dist_graph=True, part_cache=True, cache_percentage=1.0,
            num_epoch=args.epochs, root_path="/tmp",
        )
        eng = MultiChipEngine(ds, config).init()
        eng.train_epoch(0)  # warm-up/compile
        times = [eng.train_epoch(1 + e)["time"] for e in range(args.epochs - 1)]
        t = min(times) if times else float("nan")
        rows.append((w, t))
        print(f"test_result:scaling:{w}_workers_epoch_time={t:.4f}")
    effs = {}
    if len(rows) > 1:
        t1 = rows[0][1] * rows[0][0]
        for w, t in rows[1:]:
            effs[w] = t1 / (t * w)
            print(f"test_result:scaling:{w}_workers_efficiency={effs[w]:.3f}")
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.tsv"
    )
    mode = "cpu_mesh" if args.cpu_mesh else "tpu"
    with open(out, "a") as f:
        for w, t in rows:
            f.write(
                f"{mode}\t{w}\t{t:.4f}\t{effs.get(w, 1.0):.3f}\t"
                f"nodes={args.nodes} batch={args.batch_size}\n"
            )
    print(f"# appended {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
