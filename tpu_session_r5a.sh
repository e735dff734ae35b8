#!/bin/bash
# Round-5 session A: re-measure the matrix under the corrected khop3
# (Fisher-Yates without replacement — khop0===khop2===khop3 now).
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S)" >> tpu_r5a.log
  env "$@" timeout 1200 python -u bench.py >> tpu_r5a.log 2>&1
  echo "=== exit $? ===" >> tpu_r5a.log
}
run khop3_dist XGNN_BENCH_DIST_GRAPH=1
run khop0_single XGNN_BENCH_SAMPLE_TYPE=khop0
run gcn XGNN_BENCH_MODEL=gcn
run gat8 XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8
run pinsage_single XGNN_BENCH_MODEL=pinsage
run pinsage_dist XGNN_BENCH_MODEL=pinsage XGNN_BENCH_DIST_GRAPH=1
echo "ALL DONE $(date +%H:%M:%S)" >> tpu_r5a.log
