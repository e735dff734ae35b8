#!/bin/bash
cd /root/repo
set -x
date
# khop1's new dedicated kernel (with-replacement + dedup): single-store row
XGNN_BENCH_SAMPLE_TYPE=khop1 python -u bench.py 2>&1
date
# khop1 over the partitioned GGMS
XGNN_BENCH_SAMPLE_TYPE=khop1 XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo R4_SESSION_R_DONE
