#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
python -u evaluation/scaling/measure_traffic.py --batches 3 2>&1
date
echo SESSION_B_DONE
