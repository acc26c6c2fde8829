#!/bin/bash
# HISTORICAL (r4 archive): vjp_tu_sweep.py was deleted after this queue ran
# (TU kernels lost on-chip); replaying this script as-is will fail at that step.
# Round-4 queue #1: (1) the VJP time-unrolled sweep VERDICT r3 #2 demands a
# verdict for, (2) a full bench capture early in the round so this tunnel
# window's baseline is on record before the round-4 code changes land.
set -u
LOG=${1:-/tmp/tpu_r4a}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  sleep 15
}
run vjp_tu   7200 python ops_experiments/vjp_tu_sweep.py 2048 16
run bench_full 3600 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
