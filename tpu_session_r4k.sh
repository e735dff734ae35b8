#!/bin/bash
cd /root/repo
set -x
date
python -u evaluation/microbench/pallas_depth_bench.py 2>&1
date
python -u evaluation/partial_graph_cache/run.py 2>&1
date
echo R4_SESSION_K_DONE
