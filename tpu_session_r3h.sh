#!/bin/bash
# Round-3 session H: linearized-index exchange variants on chip.
cd /root/repo
set -x
date
cd evaluation/microbench && python -u exchange_bench.py 2>&1; cd /root/repo
date
echo SESSION_H_DONE
