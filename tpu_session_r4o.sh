#!/bin/bash
cd /root/repo
set -x
date
python -u evaluation/microbench/spmm_bench.py 2>&1
date
echo R4_SESSION_O_DONE
