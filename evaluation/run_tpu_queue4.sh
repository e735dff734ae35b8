#!/bin/bash
# Stage-4 TPU queue: bf16-feature bench A/B (loop agg — tiled lost the A/B),
# then the tiered out-of-core benchmark with an HBM ballast so the feature
# matrix genuinely exceeds usable HBM (simulate_v100_16g analog).
set -x
cd "$(dirname "$0")/.."

echo "=== bench agg=loop feat=bf16 ==="
XGNN_BENCH_FEAT_DTYPE=bfloat16 timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== tiered out-of-core (4.1 GB features vs ~3 GB free HBM after 12 GB ballast) ==="
timeout 5400 python -u evaluation/tiered/run.py \
  --nodes 8000000 --degree 8 --cache 0.25 --train-frac 0.01 \
  --batch-size 8000 --ballast-gb 12 2>&1 | grep -v WARNING

echo "=== queue4 done ==="
