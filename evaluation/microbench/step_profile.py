"""Per-stage profile of the flagship bench step on the real chip.

Times each pipeline stage in isolation at bench shapes (products-scale,
batch 8000, fanout 15/10/5) with forced-completion syncs, plus dtype and
gather-kernel variants — the bandwidth-fraction analysis VERDICT round-1
asked for (weak #2 / next-step #3).

Usage: python evaluation/microbench/step_profile.py [--small]
Writes results.tsv rows: stage \t time_ms \t notes
"""

import faulthandler
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> → py traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402

if os.environ.get("XGNN_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(out)
    sync_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - sync_cost), 1e-9) / iters


def main():
    small = "--small" in sys.argv
    import xgnn_tpu  # noqa: F401
    from xgnn_tpu import RunConfig
    from xgnn_tpu.constants import EMPTY_KEY
    from xgnn_tpu.models import build_model
    from xgnn_tpu.ops.unique import unique_seeded
    from xgnn_tpu.sampler import Sampler
    from xgnn_tpu.synthetic_device import make_device_dataset
    from xgnn_tpu.train import init_state, make_train_step
    from xgnn_tpu.types import Graph

    if small:
        NUM_NODE, NUM_EDGE, BATCH, FANOUT = 100_000, 1_500_000, 1000, (10, 5)
        CAPS = None
    else:
        NUM_NODE, NUM_EDGE, BATCH, FANOUT = (
            2_449_029, 62_000_000, 8000, (15, 10, 5)
        )
        CAPS = (BATCH, 133376, 1007360, 2449152)

    rows = []

    def rec(stage, t_ms, note=""):
        rows.append((stage, t_ms, note))
        print(f"{stage}\t{t_ms:.2f} ms\t{note}", flush=True)

    t0 = time.time()
    ds = make_device_dataset(
        NUM_NODE, NUM_EDGE, 128, 47, train_frac=0.08, seed=0,
        name="prof", dedup=False,
    )
    print(f"# dataset on device in {time.time()-t0:.1f}s", file=sys.stderr)

    for dtype_name in ("float32", "bfloat16"):
        cfg = RunConfig(
            batch_size=BATCH, fanout=FANOUT, num_layer=len(FANOUT),
            num_hidden=256, model="graphsage", sample_type="khop3",
            compute_dtype=dtype_name, frontier_capacities=CAPS,
            calibration_batches=0, root_path="/tmp", pipeline=False,
        )
        graph = ds.graph if getattr(ds, "graph", None) is not None else Graph.from_dataset(ds)
        sampler = Sampler(graph, cfg)
        caps = sampler.capacities

        seeds = np.full(caps[0], EMPTY_KEY, np.int32)
        take = min(len(ds.train_set), BATCH)
        seeds[:take] = np.asarray(ds.train_set[:take])
        seeds_d = jnp.asarray(seeds)
        key = jax.random.key(7)

        # --- stage: full sample (khop3 x L + dedup + remap)
        t = timeit(lambda k: sampler.sample(seeds_d, take, k), key, iters=5)
        if dtype_name == "float32":
            rec("sample_total", t * 1e3, f"caps={caps}")
        batch = sampler.sample(seeds_d, take, key)

        edges = int(
            np.asarray(sum(jnp.sum(b.mask, dtype=jnp.int32) for b in batch.blocks))
        )
        if dtype_name == "float32":
            rec("edges_per_batch", edges / 1e6, "M edges")

            # --- stage: dedup alone at layer-L scale
            ids = jnp.concatenate(
                [batch.input_nodes,
                 jax.random.randint(jax.random.key(3),
                                    (caps[-2] * FANOUT[-1],), 0, NUM_NODE,
                                    jnp.int32)]
            )
            nf = jnp.asarray(caps[-2], jnp.int32)
            t = timeit(
                jax.jit(lambda i, n: unique_seeded(i, n, caps[-1], caps[-1])),
                ids[: caps[-1] + caps[-2] * FANOUT[-1]], nf, iters=5,
            )
            rec("unique_last_layer", t * 1e3,
                f"{(caps[-1] + caps[-2]*FANOUT[-1])/1e6:.1f}M ids")

            # --- stage: XLA row gather at extract scale (feat 128-wide)
            gids = jax.random.randint(
                jax.random.key(4), (caps[-1],), 0, NUM_NODE, jnp.int32
            )
            # NOTE: feat must be an ARGUMENT, not a closure capture — jit
            # treats closure arrays as constants and hauls them to the host
            # for fingerprinting (40+ min through this environment's tunnel)
            t = timeit(
                jax.jit(lambda f, i: jnp.take(f, i, axis=0, mode="clip")),
                ds.feat, gids, iters=5,
            )
            gbs = caps[-1] * 128 * 4 * 2 / t / 1e9
            rec("extract_gather", t * 1e3, f"{gbs:.0f} GB/s eff (rw)")

        # --- stage: train step (fanout-gather + matmul fwd/bwd)
        model = build_model(cfg, ds.feat_dim, ds.num_class)
        x = jnp.take(
            jnp.asarray(ds.feat), jnp.where(
                batch.input_nodes != EMPTY_KEY, batch.input_nodes, 0
            ), axis=0, mode="clip",
        )
        labels = jnp.zeros((caps[0],), jnp.int32)
        state = init_state(model, cfg, batch.blocks, x, jax.random.key(1))
        step = make_train_step(model, cfg, donate=False)
        t = timeit(
            lambda s: step(
                s, batch.blocks, x, labels, batch.num_output,
                jax.random.key(2), batch.overflow,
            )[1],
            state, iters=5,
        )
        rec(f"train_step_{dtype_name}", t * 1e3)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "step_profile.tsv")
    with open(out, "w") as f:
        f.write("stage\ttime_ms\tnotes\n")
        for s, t, n in rows:
            f.write(f"{s}\t{t:.3f}\t{n}\n")
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
