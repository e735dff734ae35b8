#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_AGG=chunk python -u bench.py 2>&1
date
XGNN_BENCH_AGG=chunk5 python -u bench.py 2>&1
date
echo R4_SESSION_L_DONE
