"""Cache-policy factor analysis (reference Figure 10/11 analog): hit rate and
copy time across cache policies and cache percentages on a skewed graph.

Usage: python evaluation/cache_policy/run.py [--small]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from evaluation.runner import cli_subset, run_matrix  # noqa: E402

SMALL = "--small" in sys.argv
NODES = "30000" if SMALL else "300000"

# pure power-law graph (no homophily rewire): cache policies must exploit
# the degree skew, which is what this experiment measures
BASE = [
    "--synthetic", "--synthetic-nodes", NODES, "--num-epoch", "2",
    "--batch-size", "1000", "--fanout", "10", "5", "--num-hidden", "64",
    "--model", "graphsage", "--synthetic-signal", "0", "--synthetic-rmat",
]

CONFIGS = {}
for policy in ("degree", "pre_sample", "random"):
    for pct in ("0.1", "0.3"):
        CONFIGS[f"{policy}_{pct}"] = BASE + [
            "--cache-policy", policy, "--cache-percentage", pct,
        ]
CONFIGS["no_cache_hbm"] = BASE  # full HBM baseline

COLUMNS = [
    "cache_hit_rate", "epoch_time:copy_time", "epoch_time:total",
]

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.tsv")
    configs, append = cli_subset(CONFIGS)
    run_matrix(configs, COLUMNS, out, append=append)
