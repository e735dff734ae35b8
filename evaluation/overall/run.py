"""Overall comparison (reference Table 4 analog): model zoo x sampling mode
throughput/epoch-time on a synthetic products-scale graph.

Usage: python evaluation/overall/run.py [--small]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from evaluation.runner import run_matrix  # noqa: E402

SMALL = "--small" in sys.argv
NODES = "30000" if SMALL else "500000"
EPOCHS = "2" if SMALL else "4"

BASE = [
    "--synthetic", "--synthetic-nodes", NODES, "--num-epoch", EPOCHS,
    "--batch-size", "1000", "--fanout", "10", "5", "--num-hidden", "128",
]

CONFIGS = {
    # model zoo with the XGNN-default khop3 sampler
    "graphsage_khop3": BASE + ["--model", "graphsage", "--sample-type", "khop3"],
    "gcn_khop3": BASE + ["--model", "gcn", "--sample-type", "khop3"],
    "gat_khop3": BASE + ["--model", "gat", "--sample-type", "khop3"],
    # reference GAT default is 8 heads (example/samgraph/train_gat.py:73)
    "gat_h8_khop3": BASE + ["--model", "gat", "--sample-type", "khop3",
                            "--num-head", "8"],
    "pinsage_rw": BASE + ["--model", "pinsage"],
    # sampling algorithm sweep on graphsage
    "graphsage_khop0": BASE + ["--model", "graphsage", "--sample-type", "khop0"],
    "graphsage_weighted": BASE + ["--model", "graphsage", "--sample-type", "weighted_khop"],
}

# device-loop variants: the whole epoch fused into ONE lax.scan program
# (engine._train_epoch_fused).  At these small-batch shapes the host-driven
# loop is dispatch-bound through this environment's TPU tunnel (~4ms/step
# of host work vs ~0.2ms/step of device work — trace_step.py), so the fused
# epoch runs the same math 17-24x faster; accuracies match exactly.
CONFIGS.update({
    f"{name}_dloop": args + ["--device-loop"]
    for name, args in list(CONFIGS.items())
})

COLUMNS = [
    "epoch_time:total", "epoch_time:sample_total", "epoch_time:copy_time",
    "epoch_time:train_total", "final_train_acc",
]

if __name__ == "__main__":
    from evaluation.runner import cli_subset

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.tsv")
    configs, append = cli_subset(CONFIGS)
    run_matrix(configs, COLUMNS, out, append=append)
