#!/bin/bash
# Stage-6 TPU queue: real-chip overall matrix (Table-4 analog) — model zoo x
# sampling algorithm at 500k-node scale on the one real chip.
set -x
cd "$(dirname "$0")/.."

echo "=== bench (current defaults) ==="
timeout 2400 python -u bench.py 2>&1 | grep -v WARNING

echo "=== overall matrix (TPU) ==="
timeout 5400 python -u evaluation/overall/run.py 2>&1 | grep -v WARNING

echo "=== queue6 done ==="
