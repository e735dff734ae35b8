#!/bin/bash
cd /root/repo
set -x
date
# PinSAGE after the walk step-0 dedup: single-store A/B vs the 10.15M row
XGNN_BENCH_MODEL=pinsage XGNN_BENCH_SAMPLE_TYPE=random_walk python -u bench.py 2>&1
date
# PinSAGE over the partitioned GGMS vs the 5.53M row
XGNN_BENCH_MODEL=pinsage XGNN_BENCH_SAMPLE_TYPE=random_walk XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo R4_SESSION_S_DONE
