#!/bin/bash
# Round-3 TPU measurement session A (serialized — one TPU client at a time):
# 1. headline bench re-confirm
# 2. dist-graph (partitioned topology) bench row   [verdict item 6]
# 3. exchange-traffic measurement at bench shapes  [verdict item 5]
# 4. tiered pipeline A/B overlap evidence          [verdict item 9]
cd /root/repo
set -x
date
python -u bench.py 2>&1
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
python -u evaluation/scaling/measure_traffic.py --batches 3 2>&1
date
python -u evaluation/tiered/run.py --engine multi --nodes 500000 --degree 8 \
  --feat-dim 16 --batch-size 500 --cache 0.9 --train-frac 0.04 --epochs 3 2>&1
date
python -u evaluation/tiered/run.py --engine multi --nodes 500000 --degree 8 \
  --feat-dim 16 --batch-size 500 --cache 0.9 --train-frac 0.04 --epochs 3 --no-pipeline 2>&1
date
echo SESSION_A_DONE
