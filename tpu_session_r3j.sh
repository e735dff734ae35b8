#!/bin/bash
# Round-3 session J: SpMM/SDDMM bandwidth (north-star line) + PinSAGE on
# the partitioned store + PinSAGE single-store re-confirm.
cd /root/repo
set -x
date
cd evaluation/microbench && python -u spmm_bench.py 2>&1; cd /root/repo
date
XGNN_BENCH_MODEL=pinsage XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
XGNN_BENCH_MODEL=pinsage python -u bench.py 2>&1
date
echo SESSION_J_DONE
