"""Capture a device-op-level profile of the bench training step.

Runs a few serial bench- or eval-shaped engine steps under
``jax.profiler.trace`` and aggregates the captured Chrome trace JSON's
"XLA Ops" lane into per-op and per-source-line ms/step tables — the tool
for attributing step time that the stage-level timers in
``step_profile.py`` cannot see (PERF.md "Trace-level step attribution").
The Chrome JSON is parsed directly: this image's tensorboard xplane
converter is version-mismatched with its tensorflow build.

Usage: python evaluation/microbench/trace_step.py [--steps N] [--model M]
           [--heads H] [--nodes N --batch B --fanout F1 F2 ... --hidden D]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402

if os.environ.get("XGNN_CPU"):
    jax.config.update("jax_platforms", "cpu")


def _arg(name, default):
    return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default


def main():
    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine
    from xgnn_tpu.synthetic_device import make_device_dataset

    steps = int(_arg("--steps", "6"))
    model = _arg("--model", "graphsage")
    small = "--small" in sys.argv
    num_node = int(_arg("--nodes", "30000" if small else "2449029"))
    num_edge = int(_arg("--edges", str(min(25 * num_node, 62_000_000))))
    batch = int(_arg("--batch", "1000" if small else "8000"))
    hidden = int(_arg("--hidden", "256"))
    if "--fanout" in sys.argv:
        i = sys.argv.index("--fanout") + 1
        fanout = []
        while i < len(sys.argv) and sys.argv[i].isdigit():
            fanout.append(int(sys.argv[i]))
            i += 1
        fanout = tuple(fanout)
    else:
        fanout = (15, 10, 5)

    sample_type = _arg("--sample-type", "khop3")
    ds = make_device_dataset(
        num_node, num_edge, 128, 47, train_frac=0.08, seed=0,
        name="products_synth", dedup=False,
        weighted=sample_type.startswith("weighted"),
    )
    config = RunConfig(
        batch_size=batch,
        fanout=fanout,
        num_layer=len(fanout),
        num_hidden=hidden,
        model=model,
        num_head=int(_arg("--heads", "1")),
        sample_type=sample_type,
        cache_percentage=0.0,
        pipeline=False,  # serial loop: trace slices line up per step
        num_epoch=1,
        calibration_batches=2,
        root_path="/tmp",
        dataset="products_synth",
    )
    if "--dist-graph" in sys.argv:
        # partitioned-topology path (MultiChipEngine, P=1): attributes the
        # exchange machinery tax (plan/owner-draw/unpermute) per op
        import numpy as np

        from xgnn_tpu.engine.multi_engine import MultiChipEngine
        from xgnn_tpu.engine.shuffler import Shuffler

        config.use_dist_graph = True
        config.part_cache = True
        config.num_worker = 1
        engine = MultiChipEngine(ds, config)
        engine.init()
        shuffler = Shuffler(
            np.asarray(ds.train_set), config.batch_size, num_worker=1,
            worker_id=0, seed=1,
        )
        items = []
        for i, (s, n) in enumerate(shuffler.epoch_batches(0)):
            if i >= steps:
                break
            seeds = np.full((1, engine.capacities[0]), -1, np.int32)
            seeds[0, : len(s)] = s
            seeds[seeds < 0] = np.iinfo(np.int32).max
            k = jax.random.fold_in(jax.random.key(7), i)
            items.append((
                seeds, np.asarray([n], np.int32),
                np.asarray(jax.random.key_data(jax.random.split(k, 1))),
                np.asarray(jax.random.key_data(
                    jax.random.split(jax.random.fold_in(k, 1 << 20), 1)
                )),
            ))

        def run_steps():
            for seeds, nums, keys, dkeys in items:
                engine.state, metrics = engine.step_fn(
                    engine.state, engine.topo, engine.feat_parts,
                    engine.lab_parts, engine._put_batch(seeds),
                    engine._put_batch(nums), engine._put_batch(keys),
                    engine._put_batch(dkeys),
                )
            jax.block_until_ready(metrics["loss"])
    else:
        engine = Engine(ds, config)
        engine.init()

        # warm-up: compile everything outside the trace window
        from xgnn_tpu.engine.shuffler import Shuffler

        shuffler = Shuffler(ds.train_set, config.batch_size, seed=1)
        items = []
        for i, step_item in enumerate(shuffler.epoch_batches(0)):
            if i >= steps:
                break
            items.append(
                (step_item, jax.random.fold_in(jax.random.key(7), i), (0, i))
            )

        def run_steps():
            # the serial body of Engine.train_epoch, one step at a time
            for i, item in enumerate(items):
                batch, x, labels, info, _ = engine._produce(item)
                engine.state, metrics = engine._train_step(
                    engine.state, batch.blocks, x, labels, batch.num_output,
                    jax.random.fold_in(jax.random.key(3), i), batch.overflow,
                )
            jax.block_until_ready(metrics["loss"])

    if not items:
        raise SystemExit("no steps to trace (empty train shard or --steps 0)")
    run_steps()

    logdir = "/tmp/xgnn_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        run_steps()

    # Aggregate the Chrome-format trace: per-op device time, top-N.
    traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace captured (profiler unsupported through this backend?)")
        return
    import gzip
    import json
    from collections import defaultdict

    ev = json.load(gzip.open(traces[0]))["traceEvents"]
    # lane (pid,tid) -> name, to keep only device-op lanes (XLA Ops / TPU
    # core), not host python/runtime threads
    lane = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane[(e["pid"], e["tid"])] = e["args"]["name"]
    by_op = defaultdict(float)
    by_src = defaultdict(float)
    lanes_seen = defaultdict(float)
    for e in ev:
        if e.get("ph") != "X":
            continue
        ln = lane.get((e.get("pid"), e.get("tid")), "?")
        lanes_seen[ln] += e.get("dur", 0)
        if ln == "XLA Ops":  # the device op stream ("Steps"/"XLA Modules"
            by_op[e["name"]] += e.get("dur", 0)  # lanes overlap it)
            a = e.get("args") or {}
            src = a.get("source", "?")
            op = (a.get("tf_op", "") or "").split("/")[-1].rstrip(":")
            by_src[f"{src}  [{op}]"] += e.get("dur", 0)
    if not by_op:
        # fall back: the busiest lane is the device op stream
        busiest = max(lanes_seen, key=lanes_seen.get)
        print(f"# no 'XLA Op' lane; using busiest lane: {busiest}")
        for e in ev:
            if e.get("ph") == "X" and lane.get((e.get("pid"), e.get("tid"))) == busiest:
                by_op[e["name"]] += e.get("dur", 0)
    print("# lanes: " + ", ".join(f"{k}={v/1e3/steps:.1f}ms/step"
                                  for k, v in sorted(lanes_seen.items(),
                                                     key=lambda kv: -kv[1])[:6]))
    total = sum(by_op.values())
    print(f"# device op time {total/1e3/steps:.2f} ms/step over {steps} steps")
    for name, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{t/1e3/steps:9.3f} ms/step  {100*t/total:5.1f}%  {name[:110]}")
    print("# by source line (op names collide across programs; this doesn't)")
    for name, t in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t/1e3/steps:9.3f} ms/step  {100*t/total:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    main()
