#!/bin/bash
# Round-5 queue #2: persistent-cache diagnostic (VERDICT r4 next #7), a second
# e2e window sample for the adaptive put gate, and a second full bench for
# median discipline on the new headline.
set -u
LOG=${1:-/tmp/tpu_r5b}
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
run cache_probe 1200 python ops_experiments/cache_probe.py
run e2e_b 3000 python bench.py e2e
run full_b 5400 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
