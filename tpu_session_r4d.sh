#!/bin/bash
# Round-4 session C: model-spread A/Bs + weighted re-measures
cd /root/repo
set -x
date
python -u bench.py 2>&1
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
XGNN_BENCH_SAMPLE_TYPE=weighted_khop_prefix python -u bench.py 2>&1
date
XGNN_BENCH_SAMPLE_TYPE=weighted_khop_prefix XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo R4_SESSION_C_DONE
