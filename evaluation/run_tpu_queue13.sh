#!/bin/bash
# Stage-13 TPU queue: wait for queue12 (overall matrix refresh), then run the
# GCN degree-norm attribution microbench (out-deg scatter + src-scale table
# pass at bench shapes).
set -x
cd "$(dirname "$0")/.."

echo "=== waiting for queue12 to finish ==="
until grep -q "queue12 done" evaluation/queue12.log 2>/dev/null; do
  sleep 120
done

timeout 1800 python -u evaluation/microbench/gcn_deg_bench.py 2>&1 | grep -v WARNING

echo "=== queue13 done ==="
