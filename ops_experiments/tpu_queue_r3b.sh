#!/bin/bash
# Round-3 session-2 on-chip queue: fused-dispatch e2e medians (VERDICT r2 #5,
# #2 done-criterion), trainm steady-state re-measure (#3), full bench warm-up.
# Run ALONE: any concurrent python process with the axon sitecustomize on
# PYTHONPATH (even a CPU-forced pytest) contends for the single chip and
# backend init hangs indefinitely.
set -u
LOG=${1:-/tmp/tpu_r3b}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}
run e2e_a    5400 python bench.py e2e 8192
run e2e_b    1800 python bench.py e2e 8192
run e2e_c    1800 python bench.py e2e 8192
run trainm   5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 2
run trainm4k 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 2 4096
run full     7200 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
