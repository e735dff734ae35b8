#!/bin/bash
# Stage-2 TPU queue: waits for stage 1 (run_tpu_queue.sh -> /tmp/tpu_queue.log)
# to print "queue done", then runs the fanout-aggregation A/B and finishes the
# cache-policy matrix rows that round 1 cut short.
set -x
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q "queue done" /tmp/tpu_queue.log 2>/dev/null && break
  sleep 20
done

echo "=== fanout_bench ==="
timeout 3600 python -u evaluation/microbench/fanout_bench.py 2>&1 | grep -v WARNING

echo "=== cache_policy completion (random_*, no_cache_hbm) ==="
timeout 5400 python -u evaluation/cache_policy/run.py --small \
  --only random_0.1,random_0.3,no_cache_hbm 2>&1 | grep -v WARNING

echo "=== queue2 done ==="
