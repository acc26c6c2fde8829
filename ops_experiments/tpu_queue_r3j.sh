#!/bin/bash
# Round-3 session-2 queue #9: final full-bench capture with every shipped
# default of this session (n_chains=8@256 stacked kernel, dispatch_fuse=8,
# int8 rows, pack=12 transenc) — also warms the compile cache for the
# driver's round-end bench run.
set -u
LOG=${1:-/tmp/tpu_r3j}
PREV=${2:-/tmp/tpu_r3i/queue.log}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
while ! grep -qs "QUEUE DONE" "$PREV"; do sleep 60; done
sleep 30
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  sleep 15
}
run full  7200 python bench.py
run full2 3600 python bench.py
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
