#!/bin/bash
# Round-3 final confirms: headline + dist-graph benches on HEAD.
cd /root/repo
set -x
date
python -u bench.py 2>&1
date
XGNN_BENCH_DIST_GRAPH=1 python -u bench.py 2>&1
date
echo SESSION_R_DONE
