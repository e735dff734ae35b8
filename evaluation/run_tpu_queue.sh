#!/bin/bash
# Sequential TPU evaluation queue — ONE client at a time (concurrent axon
# clients queue/wedge each other).  Run: setsid nohup bash evaluation/run_tpu_queue.sh &
set -x
cd "$(dirname "$0")/.."

echo "=== sort_bench ==="
timeout 2400 python -u evaluation/microbench/sort_bench.py 2>&1 | grep -v WARNING

echo "=== microbench ==="
timeout 2400 python -u evaluation/microbench/run.py 2>&1 | grep -v WARNING

echo "=== scaling (1 real chip) ==="
timeout 2400 python -u evaluation/scaling/run.py --workers 1 --nodes 100000 --batch-size 1000 2>&1 | grep -v WARNING

echo "=== time_to_acc ==="
timeout 2400 python -u evaluation/time_to_acc/run.py --nodes 100000 --epochs 6 --batch-size 1000 2>&1 | grep -v WARNING

echo "=== tiered (out-of-core, 15.4 GB host features vs 16 GB HBM) ==="
timeout 4800 python -u evaluation/tiered/run.py --nodes 30000000 --degree 8 --cache 0.25 --train-frac 0.002 2>&1 | grep -v WARNING

echo "=== queue done ==="
