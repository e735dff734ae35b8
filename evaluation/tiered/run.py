"""Tiered-store benchmark at out-of-core scale (the BASELINE "GraphSAGE
papers100M tiered store" config; reference axis ``evaluation/table4/run.sh``).

Topology lives in HBM; node features live in HOST RAM only (they exceed the
HBM budget remaining next to topology + workspace — the regime the GGMS
exists for).  A ``cache_percentage`` hot cache (presample-ranked) serves
hits; misses ride the sync-free fixed-bucket host path.

Default scale: 30M nodes x 10 avg degree (~600M directed edges after
symmetrization), 128 float32 features = 15.4 GB host-resident features.

NOTE (this environment): the TPU is reached through a tunnel with H2D
~14 MB/s, so the measured copy_time is tunnel-bound — on directly-attached
hardware the same miss traffic rides PCIe/DMA at GB/s.  Numbers are recorded
with that caveat; the hit rate and per-stage split are the transferable
signal.

Usage: python evaluation/tiered/run.py [--nodes N] [--cache PCT] [--small]
Appends to results.tsv.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def fill_features(arr, workers: int = 4):
    """Materialize real (non-COW) pages with finite values (np.empty bit
    garbage can decode as NaN and poison the loss).  Threaded: the slice
    assignment releases the GIL, and page-fault cost dominates on this VM."""
    from concurrent.futures import ThreadPoolExecutor

    n = arr.shape[0]
    step = (n + workers - 1) // workers
    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(
            lambda i: arr[i : i + step].fill(0.01), range(0, n, step)
        ))
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=30_000_000)
    ap.add_argument("--degree", type=int, default=10)
    ap.add_argument("--feat-dim", type=int, default=128)
    ap.add_argument("--cache", type=float, default=0.25)
    ap.add_argument("--batch-size", type=int, default=8000)
    ap.add_argument("--train-frac", type=float, default=0.01)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--ballast-gb", type=float, default=0.0,
                    help="pin this much HBM to emulate a smaller chip "
                         "(simulate_v100_16g analog) so a smaller feature "
                         "matrix is still genuinely out-of-core")
    ap.add_argument("--no-pipeline", dest="pipeline", action="store_false",
                    default=True,
                    help="disable the A/B overlap (program A of step n+1 "
                         "vs host miss gather of step n) — the pipeline-off "
                         "arm of the overlap evidence")
    ap.add_argument("--engine", choices=("single", "multi"),
                    default="single",
                    help="'multi' drives the explicit two-phase A/B seam "
                         "(MultiChipEngine, num_worker=1) — the "
                         "dist_loops_arch6 --pipeline overlap under test")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--small", action="store_true",
                    help="CPU smoke test at tiny scale")
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        args.nodes, args.degree, args.feat_dim = 50_000, 8, 32
        args.batch_size, args.train_frac = 500, 0.05

    import jax.numpy as jnp
    import numpy as np

    import xgnn_tpu  # noqa: F401
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine
    from xgnn_tpu.synthetic_device import make_device_dataset

    ballast = None
    if args.ballast_gb > 0:
        from xgnn_tpu.simulate import hbm_ballast

        t0 = time.time()
        ballast = hbm_ballast(args.ballast_gb)
        print(f"# ballast: {args.ballast_gb:.1f} GB HBM pinned in "
              f"{time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    ds = make_device_dataset(
        args.nodes, args.nodes * args.degree // 2, feat_dim=8,  # tiny stub
        num_class=32, train_frac=args.train_frac, seed=0,
        name="tiered_synth", dedup=False,
    )
    print(f"# topology on device in {time.time()-t0:.0f}s: "
          f"{ds.num_node} nodes {ds.num_edge} edges", file=sys.stderr)

    # host-RAM features: allocated host-side (NOT generated on device — they
    # must not occupy HBM), page-touched so gathers hit real memory
    t0 = time.time()
    feat_host = np.empty((args.nodes, args.feat_dim), np.float32)
    fill_features(feat_host)
    gb = feat_host.nbytes / (1 << 30)
    print(f"# host features: {gb:.1f} GB in {time.time()-t0:.0f}s",
          file=sys.stderr)

    # swap in the host feature matrix + drop the device stub
    ds.feat = feat_host
    ds.feat_dim = args.feat_dim

    config = RunConfig(
        batch_size=args.batch_size, fanout=(15, 10, 5), num_layer=3,
        num_hidden=args.hidden, model="graphsage", sample_type="khop3",
        cache_percentage=args.cache, cache_policy="pre_sample",
        presample_epoch=1, pipeline=args.pipeline, num_epoch=args.epochs,
        calibration_batches=2, root_path="/tmp", dataset="tiered_synth",
    )
    if args.engine == "multi":
        from xgnn_tpu.engine.multi_engine import MultiChipEngine

        config.num_worker = 1
        config.part_cache = True
        eng = MultiChipEngine(ds, config)
    else:
        eng = Engine(ds, config)
    t0 = time.time()
    eng.init()
    caps = eng.capacities if args.engine == "multi" else eng.sampler.capacities
    ncache = eng.num_cache if args.engine == "multi" else eng.feature_source.num_cache
    print(f"# init {time.time()-t0:.0f}s caps={caps} cache={ncache}",
          file=sys.stderr)

    rows = []
    for epoch in range(args.epochs):
        r = eng.train_epoch(epoch)
        prof = eng.profiler
        hit = r.get(
            "hit_rate",
            prof._step_items.get((epoch, 0), {}).get("cache_hit_rate", 0.0),
        )
        copy_t = prof._epoch_items.get(epoch, {}).get("copy_time", 0.0)
        print(f"# epoch {epoch}: {r['time']:.1f}s loss={r['loss']:.3f} "
              f"hit_rate={hit:.3f} copy_time={copy_t:.1f}s", file=sys.stderr)
        rows.append((epoch, r["time"], hit))

    # throughput: edges aggregated per second (headline axis)
    from xgnn_tpu.engine.shuffler import Shuffler

    shuffler = Shuffler(ds.train_set, args.batch_size, seed=config.seed + 1)
    if args.engine == "multi":
        from xgnn_tpu.sampler import Sampler

        count_sampler = Sampler(eng._graph, config, list(caps))
    else:
        count_sampler = eng.sampler
    from xgnn_tpu import constants as C

    seeds0 = np.full(caps[0], C.EMPTY_KEY, C.ID_DTYPE)
    first = next(shuffler.epoch_batches(1))[0]
    seeds0[: len(first)] = first
    batch = count_sampler.sample(
        jnp.asarray(seeds0), len(first), jax.random.key(9)
    )
    edges = float(np.asarray(
        sum(jnp.sum(b.mask, dtype=jnp.int32) for b in batch.blocks)
    ))
    steps = shuffler.num_local_step
    timed = [t for e, t, _ in rows if e > 0]
    epoch_time = min(timed) if timed else rows[-1][1]
    eps = edges * steps / epoch_time

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.tsv"
    )
    new = not os.path.isfile(out)
    mode = "cpu_smoke" if args.small else "tpu"
    with open(out, "a") as f:
        if new:
            f.write(
                "# mode\tnodes\tfeat_gb\tcache_pct\thit_rate\t"
                "epoch_time_s\tedges_per_sec\tnote\n"
            )
        note = "host-tier H2D is tunnel-bound in this environment"
        if args.ballast_gb:
            note += f"; ballast={args.ballast_gb:.1f}GB"
        note += f"; pipeline={'on' if args.pipeline else 'off'}"
        f.write(
            f"{mode}\t{args.nodes}\t{gb:.1f}\t{args.cache}\t"
            f"{rows[-1][2]:.4f}\t{epoch_time:.2f}\t{eps:.0f}\t{note}\n"
        )
    del ballast
    print(f"test_result:tiered:edges_per_sec={eps:.0f}")
    print(f"test_result:tiered:hit_rate={rows[-1][2]:.4f}")
    print(f"test_result:tiered:epoch_time={epoch_time:.2f}")
    print(f"# appended to {out}")


if __name__ == "__main__":
    main()
