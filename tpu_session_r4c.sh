#!/bin/bash
# Round-4 session B (serialized):
# 1. fresh dist-graph step trace (machinery accounting at 17M)
# 2. Pallas DMA depth sweep (VERDICT item 2 datapoint)
# 3. weighted-prefix dist-graph trace (VERDICT item 6a)
# 4. GAT-8h bench under the bytes-model path selection
cd /root/repo
set -x
date
python -u evaluation/microbench/trace_step.py --dist-graph 2>&1
date
python -u evaluation/microbench/pallas_depth_bench.py 2>&1
date
python -u evaluation/microbench/trace_step.py --dist-graph --sample-type weighted_khop_prefix 2>&1
date
XGNN_BENCH_MODEL=gat XGNN_BENCH_HEADS=8 python -u bench.py 2>&1
date
echo R4_SESSION_B_DONE
