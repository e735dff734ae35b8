"""Optimization ablation (reference ``evaluation/optimization_test/run.sh``
analog): the reference stacks its optimizations row by row (+gpu-extract,
+part-cache, +use-dist-graph) and reads epoch time; this framework's
single-chip optimization stack is ablated the same way on the real chip.

Rows (cumulative where meaningful):

- ``base``            — no direct extract, no pipelining: shuffle -> sample ->
                        dedup -> extract -> train, strictly serial
- ``pipeline``        — + prefetcher overlap (sample batch n+1 during train n)
- ``gpu_extract``     — + direct in-device extraction (last-layer dedup and
                        the separate extract stage removed; the reference's
                        ``--gpu-extract`` read-through analog)
- ``device_loop``     — gpu_extract with the whole epoch fused into ONE
                        lax.scan program instead of the pipelined host loop
- ``agg_tiled``       — gpu_extract+pipeline with the tile-scan aggregation
                        (recorded negative, PERF.md)
- ``feat_bf16``       — gpu_extract+pipeline with bfloat16 feature storage
                        (capacity knob; recorded ~3% slower, PERF.md)
- ``remat``           — gpu_extract+pipeline with per-layer rematerialization

The aggregate-first transform order (PERF.md) is shape-driven DGL semantics,
not a flag, so it has no ablation row; its A/B lives in the bench history
(8.59M -> 19.99M edges/s for GCN).

Usage: python evaluation/ablation/run.py [--small]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from evaluation.runner import cli_subset, run_matrix  # noqa: E402

SMALL = "--small" in sys.argv
NODES = "30000" if SMALL else "500000"
EPOCHS = "2" if SMALL else "4"

BASE = [
    "--synthetic", "--synthetic-nodes", NODES, "--num-epoch", EPOCHS,
    "--batch-size", "1000", "--fanout", "10", "5", "--num-hidden", "128",
    "--model", "graphsage", "--sample-type", "khop3",
]

CONFIGS = {
    "base": BASE + ["--no-gpu-extract", "--no-pipeline"],
    "pipeline": BASE + ["--no-gpu-extract", "--pipeline"],
    "gpu_extract": BASE + ["--pipeline"],
    "device_loop": BASE + ["--device-loop"],
    "agg_tiled": BASE + ["--pipeline", "--agg-impl", "tiled"],
    "feat_bf16": BASE + ["--pipeline", "--feat-dtype", "bfloat16"],
    "remat": BASE + ["--pipeline", "--remat"],
}

COLUMNS = [
    "epoch_time:total", "epoch_time:sample_total", "epoch_time:copy_time",
    "epoch_time:train_total", "final_train_acc",
]

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.tsv")
    configs, append = cli_subset(CONFIGS)
    run_matrix(configs, COLUMNS, out, append=append)
