#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
XGNN_BENCH_FEAT_DTYPE=bfloat16 XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo DIST_TAKE1D_DONE
