#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
python -u bench.py 2>&1
date
echo R4_SESSION_P_DONE
