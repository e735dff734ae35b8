#!/bin/bash
# Round-4 session D: fresh single-store trace + inherited-fix re-measures
cd /root/repo
set -x
date
python -u evaluation/microbench/trace_step.py 2>&1
date
XGNN_BENCH_ARCH5=1 python -u bench.py 2>&1
date
XGNN_BENCH_SAMPLE_TYPE=khop0 python -u bench.py 2>&1
date
XGNN_BENCH_MODEL=gcn python -u bench.py 2>&1
date
XGNN_BENCH_MODEL=pinsage python -u bench.py 2>&1
date
echo R4_SESSION_D_DONE
