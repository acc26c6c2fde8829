#!/bin/bash
# Round-4 queue #5 (final): forward operating-point probe at B=32768,
# transenc full-model at B=16384, and one last full bench (now reporting
# e2e vs_window_bound). MUST drain well before round end — the driver
# needs the chip free for BENCH_r04.
set -u
LOG=${1:-/tmp/tpu_r4e}
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
run fwd32768 1800 python bench.py forward 32768
run tenc16384 3000 python ops_experiments/transenc_fullmodel_ablate.py 16384
run full_c 5400 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
