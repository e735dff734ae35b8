#!/bin/bash
# Round-5 session C: clean two-phase machinery (cache 0.9999), shipped
# spmm pre-path confirm, arch5/khop1 refresh, readiness drill on chip,
# hop2 time-to-acc curves (GNN vs MLP).
cd /root/repo
L=tpu_r5c.log
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S)" >> $L
  timeout 1800 "$@" >> $L 2>&1
  echo "=== exit $? ===" >> $L
}
run twophase_single_9999 env XGNN_BENCH_CACHE_PCT=0.9999 python -u bench.py
run twophase_dist_9999 env XGNN_BENCH_CACHE_PCT=0.9999 XGNN_BENCH_DIST_GRAPH=1 python -u bench.py
run spmm_bench python -u evaluation/microbench/spmm_bench.py
run arch5 env XGNN_BENCH_ARCH5=1 python -u bench.py
run khop1 env XGNN_BENCH_SAMPLE_TYPE=khop1 python -u bench.py
run readiness python -u evaluation/readiness/run.py --workdir /tmp/readiness_r5
run tta_hop2_sage python -u evaluation/time_to_acc/run.py --task hop2 --model graphsage --epochs 6
run tta_hop2_mlp python -u evaluation/time_to_acc/run.py --task hop2 --model mlp --epochs 6
echo "ALL DONE $(date +%H:%M:%S)" >> $L
