#!/bin/bash
cd /root/repo
set -x
date
python -u evaluation/ablation/run.py 2>&1
date
python -u evaluation/cache_policy/run.py 2>&1
date
echo R4_SESSION_J_DONE
