#!/bin/bash
# Stage-12 TPU queue: refresh the overall matrix (model zoo x sampling
# algorithms) after the GAT online-softmax rework, now including the
# reference-default 8-head GAT row; then re-render the figures.
set -x
cd "$(dirname "$0")/.."

timeout 5400 python -u evaluation/overall/run.py 2>&1 | grep -v WARNING
timeout 600 python -u evaluation/plot.py 2>&1 | tail -3

echo "=== queue12 done ==="
