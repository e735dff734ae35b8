#!/bin/bash
# Stage-10 TPU queue: wait for queue9 (ablation) to release the chip, then
# A/B the GAT 8-head optimizations landed meanwhile:
#   1. GAT h8, f32 compute  — contraction path vs the 6.26M per-pick result
#   2. GAT h8, bf16 compute — mixed-precision dots (bf16 MXU, f32 acc)
#   3. GraphSAGE headline   — confirm no regression from the gnn.py changes
set -x
cd "$(dirname "$0")/.."

echo "=== waiting for queue9 to finish ==="
until grep -q "queue9 done" evaluation/queue9.log 2>/dev/null; do
  sleep 300
done

echo "=== bench gat h8 (contraction path) ==="
timeout 2400 env XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench gat h8 bf16 compute ==="
timeout 2400 env XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 XGNN_BENCH_COMPUTE_DTYPE=bfloat16 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench graphsage (regression check) ==="
timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== queue10 done ==="
