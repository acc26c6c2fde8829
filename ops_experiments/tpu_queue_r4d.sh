#!/bin/bash
# Round-4 queue #4: longer trainm wire-row comparison (6 epochs -> 5 steady
# samples each, the r4c 3-epoch runs were variance-dominated), then two more
# full benches for run-to-run medians of the round's headline numbers.
set -u
LOG=${1:-/tmp/tpu_r4d}
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
run trainm_fp32 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 6 512 8 fp32
run trainm_bf16 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 6 512 8 bf16
run trainm_packed 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 6 512 8 packed
run trainm_packed_f32 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 6 512 32 packed
run full_a 5400 python bench.py
run full_b 5400 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
