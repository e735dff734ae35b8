#!/bin/bash
# Round-3 session E: per-op trace of the dist-graph step at bench shapes.
cd /root/repo
set -x
date
cd evaluation/microbench && python -u trace_step.py --dist-graph --steps 4 2>&1
date
echo SESSION_E_DONE
