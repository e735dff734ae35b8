#!/bin/bash
# Round-5 session D: bf16 re-A/B under the corrected khop3, overall matrix
# refresh on the corrected tree.
cd /root/repo
L=tpu_r5d.log
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S)" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== exit $? ===" >> $L
}
run bf16_single env XGNN_BENCH_FEAT_DTYPE=bfloat16 python -u bench.py
run bf16_dist env XGNN_BENCH_FEAT_DTYPE=bfloat16 XGNN_BENCH_DIST_GRAPH=1 python -u bench.py
run overall timeout 3600 python -u evaluation/overall/run.py
echo "ALL DONE $(date +%H:%M:%S)" >> $L
