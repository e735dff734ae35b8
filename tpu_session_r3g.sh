#!/bin/bash
# Round-3 session G: dist-graph re-measure (owner-side mask pass removed) +
# the sampling-algorithm axis on the partitioned store (khop0, weighted
# prefix) — first chip rows for those combinations.
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
XGNN_BENCH_DIST_GRAPH=1 XGNN_BENCH_SAMPLE_TYPE=khop0 python -u bench.py 2>&1
date
XGNN_BENCH_DIST_GRAPH=1 XGNN_BENCH_SAMPLE_TYPE=weighted_khop_prefix python -u bench.py 2>&1
date
echo SESSION_G_DONE
