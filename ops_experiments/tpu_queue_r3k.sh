#!/bin/bash
# Round-3 session-2 queue #10: time-unrolled VJP kernel sweep (train-step
# device rate via single-dispatch packed_many timing).
set -u
LOG=${1:-/tmp/tpu_r3k}
PREV=${2:-/tmp/tpu_r3j/queue.log}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
while ! grep -qs "QUEUE DONE" "$PREV"; do sleep 60; done
sleep 30
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  sleep 15
}
run vjp_tu 10800 python ops_experiments/vjp_tu_sweep.py 2048 16
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
