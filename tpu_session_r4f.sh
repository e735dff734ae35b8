#!/bin/bash
cd /root/repo
set -x
date
XGNN_BENCH_AGG=tiled python -u bench.py 2>&1
date
XGNN_BENCH_AGG=tiled XGNN_BENCH_MODEL=gcn python -u bench.py 2>&1
date
echo R4_SESSION_E_DONE
