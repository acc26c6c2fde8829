#!/bin/bash
# Round-3 on-chip queue (after transenc_impl_sweep): dirbatch verdict,
# trainm steady-state re-measure, fused-dispatch e2e medians, full bench warm.
set -u
LOG=${1:-/tmp/tpu_r3}
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
run dirbatch 9000 python ops_experiments/bigru_dirbatch_sweep.py 16384 gru
run trainm   5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 2
run trainm4k 5400 python ops_experiments/trainm_onchip.py 65536 pallas bf16 2 4096
run e2e_a    3600 python bench.py e2e 8192
run e2e_b    1200 python bench.py e2e 8192
run e2e_c    1200 python bench.py e2e 8192
run full     5400 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
