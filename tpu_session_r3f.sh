#!/bin/bash
# Round-3 session F: bf16 feature rows on the dist-graph path (halves the
# exchanged feature bytes AND the materialized response double-read).
cd /root/repo
set -x
date
XGNN_BENCH_DIST_GRAPH=1 XGNN_BENCH_FEAT_DTYPE=bfloat16 python -u bench.py 2>&1
date
echo SESSION_F_DONE
