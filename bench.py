"""Benchmark harness: GraphSAGE on a synthetic ogbn-products-scale graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: edges aggregated per second per chip (the reference's headline
throughput axis — the ``epoch:sample_thpt`` / epoch-time family,
``example/samgraph/sgnn/train_gcn.py:316-356``) for the full pipelined
sample→extract→train loop on one chip.

The graph is generated ON DEVICE (power-law, ~products scale: 2.45M nodes,
~110M directed edges, 100 feats, 47 classes) — host CPUs in this environment
are far too slow for 100M-edge preprocessing, and the TPU generates it in
seconds (``xgnn_tpu/synthetic_device.py``).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

NUM_NODE = 2_449_029
NUM_EDGE = 62_000_000  # pre-symmetrize draw count
# products' 100 features, padded to the TPU lane width: unaligned 400B rows
# gather at ~half the rate of 512B rows (see BASELINE.md microbenchmarks) —
# a real deployment stores node features lane-padded.  The workload is
# strictly larger (more bytes gathered + wider matmuls).
FEAT_DIM = 128
NUM_CLASS = 47
BATCH = 8000
FANOUT = (15, 10, 5)
# epoch 0 is warm-up (compile); epoch 1+ measured.  Override for soak runs
# (throughput-stability evidence over many epochs): XGNN_BENCH_EPOCHS=10
EPOCHS = int(os.environ.get("XGNN_BENCH_EPOCHS", "2"))
TRAIN_FRAC = 0.08  # ~196k train nodes (products has 196k)


def main():
    import jax
    import jax.numpy as jnp

    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine
    from xgnn_tpu.engine.shuffler import Shuffler
    from xgnn_tpu.synthetic_device import make_device_dataset

    t0 = time.time()
    model = os.environ.get("XGNN_BENCH_MODEL", "graphsage")
    sample_type = os.environ.get("XGNN_BENCH_SAMPLE_TYPE", "khop3")
    if model == "pinsage":
        sample_type = "random_walk"  # the pinsage path (RunConfig coerces too)
    elif sample_type.startswith("weighted") and sample_type != "weighted_khop_prefix":
        # only the prefix table has an on-device producer (alias construction
        # is sequential per row — host datagen territory, cpp/convert.cpp)
        print("# weighted bench uses the prefix variant", file=sys.stderr)
        sample_type = "weighted_khop_prefix"
    ds = make_device_dataset(
        NUM_NODE, NUM_EDGE, FEAT_DIM, NUM_CLASS,
        train_frac=TRAIN_FRAC, seed=0, name="products_synth", dedup=False,
        weighted=sample_type.startswith("weighted"),
    )
    print(f"# generated on-device: {ds.num_node} nodes {ds.num_edge} edges "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)
    if float(os.environ.get("XGNN_BENCH_CACHE_PCT", "0")) > 0:
        # two-phase configs serve misses from HOST features: swap the device
        # feature matrix for a host-resident one (constant-filled — values
        # don't affect throughput; a device pull over the tunnel would)
        feat_host = np.empty((NUM_NODE, FEAT_DIM), np.float32)
        from concurrent.futures import ThreadPoolExecutor

        step = (NUM_NODE + 3) // 4
        with ThreadPoolExecutor(4) as ex:
            list(ex.map(lambda i: feat_host[i:i+step].fill(0.01),
                        range(0, NUM_NODE, step)))
        ds.feat = feat_host

    # Every model runs the fast-path configuration: the GCN/GAT
    # aggregate-first reorder (models/gnn.py) keeps the transform off the
    # src frontier, so no model materializes a (src_cap, hidden) activation
    # and none needs layer remat or an unpipelined extract anymore.
    _env_flag = lambda name, default: (
        os.environ[name] == "1" if name in os.environ else default
    )
    # PinSAGE is the random-walk path (2-layer model, walk-frequency
    # neighbors) — the khop3 caps below don't apply, so let calibration size
    # its frontiers
    pinsage = model == "pinsage"
    config = RunConfig(
        batch_size=BATCH,
        fanout=FANOUT,
        num_layer=len(FANOUT),
        num_hidden=256,
        model=model,
        sample_type=sample_type,
        # 0.0 = all feats in HBM (fused fast path).  XGNN_BENCH_CACHE_PCT
        # in (0,1) engages the two-phase partial-cache machinery — at 0.99
        # the host path is ~idle, so the step-time delta vs the fused row
        # IS the two-phase machinery term (crossover model input)
        cache_percentage=float(os.environ.get("XGNN_BENCH_CACHE_PCT", "0.0")),
        cache_policy=os.environ.get("XGNN_BENCH_CACHE_POLICY", "pre_sample"),
        pipeline=_env_flag("XGNN_BENCH_PIPELINE", True),
        num_epoch=EPOCHS,
        # A/B overrides (the driver runs the bare defaults)
        agg_impl=os.environ.get("XGNN_BENCH_AGG", "loop"),
        feat_dtype=os.environ.get("XGNN_BENCH_FEAT_DTYPE", "float32"),
        compute_dtype=os.environ.get("XGNN_BENCH_COMPUTE_DTYPE", "float32"),
        device_loop=os.environ.get("XGNN_BENCH_DEVICE_LOOP", "0") == "1",
        num_head=int(os.environ.get("XGNN_BENCH_HEADS", "1")),
        # pre-measured frontier capacities for this graph/fanout — a
        # sampling-shape property, model-independent (saves the calibration
        # compile; overflow-grow still protects correctness)
        frontier_capacities=None if pinsage else (BATCH, 133376, 1007360, 2449152),
        calibration_batches=2 if pinsage else 0,
        remat=_env_flag("XGNN_BENCH_REMAT", False),
        root_path="/tmp",
        dataset="products_synth",
    )
    # XGNN_BENCH_DIST_GRAPH=1: run the PARTITIONED-topology path through
    # MultiChipEngine on the one chip (P=1 exchange degenerates to copies
    # but the owner-sampling code is fully exercised — the `use_dist_graph`
    # measurement row the round-2 verdict asked for).  XGNN_BENCH_DIST_PCT
    # < 1 adds the host cold topology tier.
    dist_graph = os.environ.get("XGNN_BENCH_DIST_GRAPH", "0") == "1"
    # XGNN_BENCH_ARCH5=1: the DISAGGREGATED (FGNN) engine on one chip —
    # 1 sampler role + 1 trainer role share the chip (role-degenerate), so
    # the full arch5 pipeline (sampling service, D2D handoff, per-trainer
    # store, stitched SPMD train step) is measured end to end
    # (reference dist_loops_arch5.cc:56-297).
    arch5 = os.environ.get("XGNN_BENCH_ARCH5", "0") == "1"
    if arch5:
        from xgnn_tpu.engine.disagg_engine import DisaggregatedEngine
        from xgnn_tpu.sampler import Sampler

        config.num_sample_worker = 1
        config.num_train_worker = 1
        engine = DisaggregatedEngine(ds, config)
    elif dist_graph:
        from xgnn_tpu.engine.multi_engine import MultiChipEngine
        from xgnn_tpu.sampler import Sampler

        config.use_dist_graph = True
        config.part_cache = True
        config.num_worker = 1
        config.dist_graph_percentage = float(
            os.environ.get("XGNN_BENCH_DIST_PCT", "1.0")
        )
        engine = MultiChipEngine(ds, config)
    else:
        engine = Engine(ds, config)
    t0 = time.time()
    engine.init()
    if arch5:
        caps = engine.svc.capacities
    elif dist_graph:
        caps = engine.capacities
    else:
        caps = engine.sampler.capacities
    print(f"# init {time.time()-t0:.1f}s; caps={caps}", file=sys.stderr)

    epoch_times = []
    for epoch in range(EPOCHS):
        r = engine.train_epoch(epoch)
        print(f"# epoch {epoch}: {r['time']:.2f}s loss={r['loss']:.4f} "
              f"acc={r['train_acc']:.4f}", file=sys.stderr)
        if arch5:
            disp = engine.profiler._epoch_items.get(epoch, {}).get(
                "sample_dispatch", 0.0
            )
            print(f"# epoch {epoch}: sample+extract dispatch "
                  f"{disp:.2f}s ({disp / max(r['time'], 1e-9):.0%} of wall)",
                  file=sys.stderr)
        if epoch > 0:
            epoch_times.append(r["time"])

    # aggregated-edge count: re-sample a few batches and scale (keeps the
    # timed loop unperturbed; the single-store Sampler draws the same
    # distribution as the partitioned path)
    if arch5:
        count_sampler = engine.svc.samplers[0]
    elif dist_graph:
        count_sampler = Sampler(engine._graph, config, list(caps))
    else:
        count_sampler = engine.sampler
    shuffler = Shuffler(ds.train_set, BATCH, seed=config.seed + 1)
    edge_counts = []
    for i, (seeds, n) in enumerate(shuffler.epoch_batches(1)):
        if i >= 5:
            break
        batch = count_sampler.sample(
            jnp.asarray(seeds), n, jax.random.fold_in(jax.random.key(9), i)
        )
        edge_counts.append(
            sum(jnp.sum(b.mask, dtype=jnp.int32) for b in batch.blocks)
        )
    edges_per_step = float(np.mean(np.asarray(jnp.stack(edge_counts))))
    steps = shuffler.num_local_step
    epoch_time = float(np.mean(epoch_times))
    edges_per_sec = edges_per_step * steps / epoch_time

    vs_baseline = 1.0
    if os.path.isfile(BASELINE_FILE):
        base = json.load(open(BASELINE_FILE))
        if base.get("edges_per_sec"):
            vs_baseline = edges_per_sec / base["edges_per_sec"]
    else:
        json.dump(
            {"edges_per_sec": edges_per_sec, "epoch_time": epoch_time},
            open(BASELINE_FILE, "w"),
        )

    heads = int(os.environ.get("XGNN_BENCH_HEADS", "1"))
    model_tag = f"{model}_h{heads}" if heads > 1 else model
    if not pinsage and sample_type != "khop3":
        # the COERCED sample type: what actually ran, not what was requested
        model_tag = f"{model_tag}_{sample_type}"
    if arch5:
        model_tag += "_arch5"
    elif dist_graph:
        model_tag += "_distgraph"
        if config.dist_graph_percentage < 1.0:
            model_tag += f"{config.dist_graph_percentage:g}"
    print(json.dumps({
        "metric": f"{model_tag}_products_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "epoch_time_s": round(epoch_time, 3),
    }))


def _run_with_retry():
    """The axon-tunneled TPU backend is transiently UNAVAILABLE after a
    client dies mid-compile (recovers on its own in 10-50 min).  A failed
    backend is cached for the process lifetime, so retry by re-exec'ing —
    fresh process, fresh backend handshake."""
    tries = int(os.environ.get("XGNN_BENCH_TRIES", "3"))
    try:
        main()
    except Exception as e:  # noqa: BLE001 — only the UNAVAILABLE shape retries
        msg = str(e)
        transient = "UNAVAILABLE" in msg or "Unable to initialize backend" in msg
        if transient and tries > 1:
            print(f"# TPU backend unavailable; retrying in 300s "
                  f"({tries - 1} tries left)", file=sys.stderr)
            time.sleep(300)
            os.environ["XGNN_BENCH_TRIES"] = str(tries - 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise


if __name__ == "__main__":
    _run_with_retry()
