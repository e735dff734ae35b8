"""Partial graph cache sweep (reference ``evaluation/partial-graph-cache/
run_xgnn.sh`` analog): how much of the topology lives in device memory
(``dist_graph_percentage``) x how much of the feature table is cached
(``cache_percentage``), through the full multi-chip GGMS.

The reference sweeps ``--use-dist-graph {0.0,0.25,0.5,0.75,1.0}`` at 8 GPUs
and reads epoch time; here each point additionally reports the two tier hit
rates the sweep actually trades off:

- ``feat_hit_rate`` — fraction of extracted feature rows served by the
  partitioned HBM cache (vs the host miss path),
- ``frontier_hot_frac`` — access-weighted fraction of frontier nodes whose
  adjacency lists live in the device hot prefix (vs the host cold tier),
  computed from the node-access log against ``num_cache_node``
  (reference dist_engine.cc:224-235 sizes the prefix by edge percentage).

Runs on the virtual CPU mesh by default (structural validation: hit rates
and traffic are mesh-size-exact; times are CPU times), or on a real slice
with ``--tpu``.

Usage: python evaluation/partial_graph_cache/run.py [--workers 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real device mesh instead of CPU")
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--batch-size", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.workers}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    # node-access analytics must be on BEFORE engine init: the fused
    # all-HBM program only emits its frontier if built in logging mode
    os.environ["XGNN_LOG_NODE_ACCESS"] = "1"

    from xgnn_tpu import RunConfig, synthetic
    from xgnn_tpu.engine.multi_engine import MultiChipEngine

    ds = synthetic.make_synthetic_dataset(
        num_node=args.nodes, avg_degree=10, feat_dim=64, num_class=16,
        seed=0,
    )

    # (graph %, feature cache %): the reference's graph axis at a fixed
    # feature cache, plus a feature axis at the middle graph point
    points = [
        (0.25, 0.25), (0.50, 0.25), (0.75, 0.25), (1.00, 0.25),
        (0.50, 0.10), (0.50, 0.50), (0.50, 1.00),
    ]

    rows = []
    for g_pct, f_pct in points:
        config = RunConfig(
            batch_size=args.batch_size, fanout=(10, 5), num_layer=2,
            num_hidden=64, model="graphsage", sample_type="khop3",
            num_worker=args.workers,
            use_dist_graph=True, dist_graph_percentage=g_pct,
            part_cache=True, cache_percentage=f_pct,
            cache_policy="pre_sample", presample_epoch=1,
            pipeline=True, num_epoch=args.epochs, root_path="/tmp",
        )
        eng = MultiChipEngine(ds, config).init()
        eng.train_epoch(0)  # warm-up/compile
        t0 = time.perf_counter()
        r = eng.train_epoch(1)
        dt = time.perf_counter() - t0
        freq = eng.profiler.node_access_frequency()
        total = sum(c for _, c in freq)
        ncn = eng.num_cache_node
        hot = (
            sum(c for i, c in freq if i < ncn) if ncn is not None else total
        )
        hot_frac = hot / max(total, 1)
        name = f"g{int(g_pct * 100):03d}_f{int(f_pct * 100):03d}"
        rows.append((
            name, g_pct, f_pct,
            ncn if ncn is not None else ds.num_node,
            r["hit_rate"], hot_frac, dt, r["loss"],
        ))
        print(
            f"test_result:pgc:{name}_feat_hit={r['hit_rate']:.4f}", flush=True
        )
        print(f"test_result:pgc:{name}_hot_frac={hot_frac:.4f}", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.tsv"
    )
    mode = "tpu" if args.tpu else "cpu_mesh"
    with open(out, "w") as f:
        f.write(
            "name\tmode\tworkers\tgraph_pct\tfeat_cache_pct\tnum_cache_node\t"
            "feat_hit_rate\tfrontier_hot_frac\tepoch_time\tloss\n"
        )
        for name, g, fp, ncn, hit, hf, dt, loss in rows:
            f.write(
                f"{name}\t{mode}\t{args.workers}\t{g}\t{fp}\t{ncn}\t"
                f"{hit:.4f}\t{hf:.4f}\t{dt:.4f}\t{loss:.4f}\n"
            )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
