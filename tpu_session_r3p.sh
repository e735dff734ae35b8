#!/bin/bash
# Round-3 session K: degree-bucketed SpMM on chip (vs edge-scatter).
cd /root/repo/evaluation/microbench
set -x
date
python -u spmm_bench.py 2>&1
date
echo SESSION_P_DONE
