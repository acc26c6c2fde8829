#!/bin/bash
# Round-3 session-2 queue #8: back-to-back trainm fuse=1 vs fuse=8 in the
# same tunnel window (cross-run comparisons are +/-2x on this link: 6,450
# samples/s non-fused vs 3,459 fused were measured 2.5h apart and say
# nothing). 3 epochs each -> two steady-state epochs per config.
set -u
LOG=${1:-/tmp/tpu_r3i}
PREV=${2:-/tmp/tpu_r3h/queue.log}
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
run fuse1  5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 3 512 1
run fuse8  5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 3 512 8
run fuse1b 5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 3 512 1
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
