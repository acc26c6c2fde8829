#!/bin/bash
# Round-3 session-2 queue #3: trainm at B=2048 (the shape the 35k samples/s
# step-rate ceiling was measured at — closes the VERDICT #3 attribution) and
# two more e2e runs on the SHIPPED transfer path (kinetics_quant auto->int8)
# for median +/- spread reporting in PERF.md/BASELINE.md.
set -u
LOG=${1:-/tmp/tpu_r3d}
PREV=${2:-/tmp/tpu_r3c/queue.log}
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
run trainm2k 5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 2 2048
run e2e_i8a  3600 python bench.py e2e 8192 auto
run e2e_i8b  1800 python bench.py e2e 8192 auto
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
