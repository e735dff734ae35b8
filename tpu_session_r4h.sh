#!/bin/bash
# Round-4 end-of-round confirms on HEAD
cd /root/repo
set -x
date
python -u bench.py 2>&1
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo R4_SESSION_H_DONE
