#!/bin/bash
# Stage-3 TPU queue: after stage 2, A/B the full bench across the round-2
# perf knobs (tiled fanout aggregation, bf16 feature storage).
set -x
cd "$(dirname "$0")/.."

for i in $(seq 1 1080); do
  grep -q "queue2 done" /tmp/tpu_queue2.log 2>/dev/null && break
  sleep 20
done

echo "=== bench agg=tiled ==="
XGNN_BENCH_AGG=tiled timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench agg=tiled feat=bf16 ==="
XGNN_BENCH_AGG=tiled XGNN_BENCH_FEAT_DTYPE=bfloat16 \
  timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== bench agg=loop feat=bf16 ==="
XGNN_BENCH_FEAT_DTYPE=bfloat16 \
  timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== queue3 done ==="
