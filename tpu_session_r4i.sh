#!/bin/bash
cd /root/repo
set -x
date
python -u evaluation/overall/run.py 2>&1
date
echo R4_SESSION_I_DONE
