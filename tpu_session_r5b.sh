#!/bin/bash
# Round-5 session B: SpMM attribution, crossover measured arms, two-phase
# machinery terms, PinSAGE-dist + GAT-8h traces, weighted-prefix re-A/B.
cd /root/repo
L=tpu_r5b.log
run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S)" >> $L
  timeout 1800 "$@" >> $L 2>&1
  echo "=== exit $? ===" >> $L
}
run spmm_attrib python -u evaluation/microbench/spmm_attrib.py
run twophase_single env XGNN_BENCH_CACHE_PCT=0.99 python -u bench.py
run twophase_dist env XGNN_BENCH_CACHE_PCT=0.99 XGNN_BENCH_DIST_GRAPH=1 python -u bench.py
run wprefix_single env XGNN_BENCH_SAMPLE_TYPE=weighted_khop_prefix python -u bench.py
run wprefix_dist env XGNN_BENCH_SAMPLE_TYPE=weighted_khop_prefix XGNN_BENCH_DIST_GRAPH=1 python -u bench.py
run pinsage_dist_trace python -u evaluation/microbench/trace_step.py --model pinsage --dist-graph --steps 6
run gat8_trace python -u evaluation/microbench/trace_step.py --model gat --heads 8 --steps 4
run crossover python -u evaluation/crossover/run.py --ballast-gb 10
echo "ALL DONE $(date +%H:%M:%S)" >> $L
