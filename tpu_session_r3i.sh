#!/bin/bash
# Round-3 session I: dist-graph bench with linearized exchange picks.
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo SESSION_I_DONE
