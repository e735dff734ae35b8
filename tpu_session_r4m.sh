#!/bin/bash
cd /root/repo
set -x
date
python -u evaluation/tiered/run.py --engine multi --nodes 500000 --degree 8 \
  --feat-dim 16 --batch-size 500 --cache 0.9 --train-frac 0.04 --epochs 3 2>&1
date
python -u evaluation/tiered/run.py --engine multi --nodes 500000 --degree 8 \
  --feat-dim 16 --batch-size 500 --cache 0.9 --train-frac 0.04 --epochs 3 --no-pipeline 2>&1
date
echo R4_SESSION_M_DONE
