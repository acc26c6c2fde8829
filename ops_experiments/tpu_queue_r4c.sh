#!/bin/bash
# Round-4 queue #3: controlled trainm steady-state comparison, fp32 vs bf16
# wire rows (--train_transfer), same tunnel window back to back; then a
# final full bench with whatever defaults the r4b ablation shipped.
set -u
LOG=${1:-/tmp/tpu_r4c}
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
run srcembed 2400 python ops_experiments/src_embed_ablate.py 16384
run trainm_fp32 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 3 512 8 fp32
run trainm_bf16 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 3 512 8 bf16
run trainm_packed 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 3 512 8 packed
run e2e_a 2400 python bench.py e2e 8192
run full  5400 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
