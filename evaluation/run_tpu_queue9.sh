#!/bin/bash
# Stage-9 TPU queue: wait for the TPU to come back (it went UNAVAILABLE at
# ~00:30 and probes have hung since), then run the two pending measurement
# jobs back-to-back so none of the recovery window is wasted:
#   1. queue8 — headline GraphSAGE re-confirm + the reference-default
#      8-head GAT config (train_gat.py:73)
#   2. the optimization-ablation experiment (writes ablation/results.tsv)
set -x
cd "$(dirname "$0")/.."

echo "=== waiting for TPU ==="
# Gentle cadence: killing a hung TPU client is itself what prolongs a
# wedge in this environment, so probe with a LONG timeout and a LONG gap
# rather than hammering every few minutes.
until timeout 900 python -c "
import jax, numpy as np
x = jax.numpy.arange(8.0)
print('probe ok:', np.asarray((x*2).sum()))
"; do
  echo "tpu still down; retrying in 600s"
  sleep 600
done

echo "=== TPU is back; running queue8 ==="
bash evaluation/run_tpu_queue8.sh

echo "=== ablation ==="
timeout 7200 python -u evaluation/ablation/run.py 2>&1 | grep -v WARNING

echo "=== queue9 done ==="
