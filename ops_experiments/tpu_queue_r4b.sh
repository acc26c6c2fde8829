#!/bin/bash
# HISTORICAL (r4 archive): the packmul attn variant was deleted after this
# queue ran (measured a wash); replaying packmul@* now silently measures the
# default packed16 kernel instead.
# Round-4 queue #2: (1) B=512 + B=2048 production train-step device ceiling
# (re-base trainm, VERDICT r3 next #2), (2) transenc full-model gap ablation
# + softmax kernel variants (next #4), (3) e2e medians with the two-stage
# put pipeline (next #3), (4) full bench.
set -u
LOG=${1:-/tmp/tpu_r4b}
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
run step512  3600 python ops_experiments/train_step_rate.py 512 16
run step2048 1800 python ops_experiments/train_step_rate.py 2048 16
run ablate   3600 python ops_experiments/transenc_fullmodel_ablate.py 8192
run sweep    3600 python ops_experiments/transenc_impl_sweep.py 8064 packed@12x4,packmul@12x4,packed16@12x4,packmul@6x8,packed16@6x8
run e2e_a    3600 python bench.py e2e 8192
run full     5400 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
