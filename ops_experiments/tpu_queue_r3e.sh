#!/bin/bash
# Round-3 session-2 queue #4: chains sweep part 2 — deeper chain counts at
# small tiles (trend from part 1: (2,128) +4.0% > (2,256) +1.7%), plus the
# FULL-MODEL 1@128-vs-2@128 comparison that decides the shipped default.
set -u
LOG=${1:-/tmp/tpu_r3e}
PREV=${2:-/tmp/tpu_r3d/queue.log}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
while ! grep -qs "QUEUE DONE" "$PREV"; do sleep 60; done
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}
run chains2 10800 python ops_experiments/bigru_chains_sweep.py 16384 gru \
    "kernel:4@128,4@256,3@192,8@256;model:1@128,2@128,4@128"
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
