#!/bin/bash
# Stage-5 TPU queue: tiered out-of-core retry. 12M nodes x 128 f32 = 6.1 GB
# features vs ~5 GB usable HBM after an 8 GB ballast (+ topology + sampler
# workspace) — features genuinely cannot be HBM-resident; the 25% hot cache
# (1.5 GB) + host cold tier serve them.
set -x
cd "$(dirname "$0")/.."

echo "=== tiered out-of-core (6.1 GB features, 8 GB ballast) ==="
timeout 5400 python -u evaluation/tiered/run.py \
  --nodes 12000000 --degree 8 --cache 0.25 --train-frac 0.005 \
  --batch-size 8000 --ballast-gb 8 2>&1 | grep -v WARNING

echo "=== queue5 done ==="
