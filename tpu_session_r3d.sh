#!/bin/bash
# Round-3 session D: sort-free exchange plan + keysort compaction on chip.
# Serialized single TPU client (one chip; concurrent clients wedge).
cd /root/repo
set -x
date
cd evaluation/microbench && python -u exchange_bench.py 2>&1; cd /root/repo
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo SESSION_D_DONE
