#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_SAMPLE_TYPE=khop0 XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
XGNN_BENCH_MODEL=pinsage XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo R4_SESSION_F_DONE
