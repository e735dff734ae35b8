#!/bin/bash
# Stage-7 TPU queue: products-scale GCN and GAT bench rows (the remaining
# BASELINE.json config entries measurable on one chip).
set -x
cd "$(dirname "$0")/.."

echo "=== bench model=gcn ==="
timeout 2400 env XGNN_BENCH_MODEL=gcn python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench model=gat ==="
timeout 2400 env XGNN_BENCH_MODEL=gat python -u bench.py 2>&1 | grep -v WARNING

echo "=== queue7 done ==="
