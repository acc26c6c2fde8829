#!/bin/bash
# Round-3 session-2 queue #7: deeper-chain configs at FULL-MODEL level (the
# bare kernel kept improving to 8@256 = +8.3%; model sweep only covered @128),
# then a full bench capture with the shipped default (2@128).
set -u
LOG=${1:-/tmp/tpu_r3h}
PREV=${2:-/tmp/tpu_r3g/queue.log}
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
run chains3 7200 python ops_experiments/bigru_chains_sweep.py 16384 gru \
    "model:2@256,4@256,8@256;kernel:16@256,8@128"
run full    7200 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
