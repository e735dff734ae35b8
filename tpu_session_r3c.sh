#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
cd evaluation/microbench && python -u pinsage_bench.py 2>&1; cd /root/repo
date
python -u bench.py 2>&1
date
echo SESSION_C_DONE
