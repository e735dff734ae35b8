#!/bin/bash
# Stage-11 TPU queue: A/B the online-softmax GAT score path (scores computed
# from the rows the aggregation loop already gathers — no (src, H) score
# table, no element-bound per-pick score gathers):
#   1. GAT h8 f32, default limits  (layer-0 contraction) — queue10 OOM check
#   2. GAT h8 f32, forced per-pick (XGNN_GAT_MAT_LIMIT=0)
#   3. GAT h8 bf16 compute, default limits
#   4. GAT h1 f32 single-head regression check
set -x
cd "$(dirname "$0")/.."

echo "=== bench gat h8 f32 (contraction layer0) ==="
timeout 2400 env XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench gat h8 f32 per-pick forced ==="
timeout 2400 env XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 XGNN_GAT_MAT_LIMIT=0 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench gat h8 bf16 compute ==="
timeout 2400 env XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 XGNN_BENCH_COMPUTE_DTYPE=bfloat16 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench gat h1 ==="
timeout 2400 env XGNN_BENCH_MODEL=gat python -u bench.py 2>&1 | grep -v WARNING

echo "=== queue11 done ==="
