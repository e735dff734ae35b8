#!/bin/bash
# Stage-8 TPU queue: (a) re-confirm the headline GraphSAGE bench after the
# GAT-ELU/bench-knob commits, (b) the reference-default 8-head GAT config
# (train_gat.py:73 num_heads=8, num_hidden 32/head -> 256 concat — here
# num_hidden=256 with 8 heads gives the identical per-head/concat widths).
set -x
cd "$(dirname "$0")/.."

echo "=== bench model=graphsage (headline re-confirm) ==="
timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench model=gat heads=8 (reference default config) ==="
timeout 2400 env XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 python -u bench.py 2>&1 | grep -v WARNING

echo "=== queue8 done ==="
