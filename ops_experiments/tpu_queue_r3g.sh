#!/bin/bash
# Round-3 session-2 queue #6: re-run the int8 e2e medians lost to the
# 21:16-21:47 tunnel outage, and re-measure the trainm steady-state loop with
# the new fused step dispatch (--step_fuse 8 default).
set -u
LOG=${1:-/tmp/tpu_r3g}
PREV=${2:-/tmp/tpu_r3f/queue.log}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
while ! grep -qs "QUEUE DONE" "$PREV"; do sleep 60; done
sleep 30   # let the previous client's chip claim drain before dialing
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  sleep 15
}
run trainm_f8  5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 2
run e2e_i8a    3600 python bench.py e2e 8192 auto
run e2e_i8b    1800 python bench.py e2e 8192 auto
run e2e_i8c    1800 python bench.py e2e 8192 auto
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
