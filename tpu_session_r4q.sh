#!/bin/bash
cd /root/repo
set -x
date
# chip-run time-to-acc (planted-signal, 300k nodes): TPU rows for Figure 15b analog
python -u evaluation/time_to_acc/run.py --nodes 300000 --epochs 10 2>&1
date
echo R4_SESSION_Q_DONE
