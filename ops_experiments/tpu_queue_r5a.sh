#!/bin/bash
# Round-5 queue #1: validate the reworked E2E pipeline (2 concurrent mega-put
# streams + chained fetch thread + u8 ML-byte fetch + depth-2 megabatch flight,
# VERDICT r4 next #1/#2), probe the B=65536 forward operating point (#4),
# re-run the 1-run ceiling captures to medians (#5: step512 x3), measure the
# bf16-embed-conv transenc change + B=32768 (#6), and re-run trainm packed
# with the fused on-device validation (#3).
set -u
LOG=${1:-/tmp/tpu_r5a}
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
run e2e_a 3000 python bench.py e2e
run fwd65536 2400 python bench.py forward 65536
run step512_a 1800 python ops_experiments/train_step_rate.py 512 16
run step512_b 1800 python ops_experiments/train_step_rate.py 512 16
run step512_c 1800 python ops_experiments/train_step_rate.py 512 16
run tenc32768 2400 python bench.py transenc 32768
run tenc_ablate 3000 python ops_experiments/transenc_fullmodel_ablate.py 16384
run full_a 5400 python bench.py
run trainm_packed 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16 6 512 8 packed
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
