#!/bin/bash
# Round-3 session-2 queue #5: dispatch_fuse depth probe — k=16 halves the
# per-mega RPC share again and doubles the put size (wire efficiency rose
# 24.4 -> 44.6 MB/s from 1.1 to 8.8 MB payloads); if it beats k=8 cleanly,
# bump CallModsConfig.dispatch_fuse.
set -u
LOG=${1:-/tmp/tpu_r3f}
PREV=${2:-/tmp/tpu_r3e/queue.log}
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
run e2e_f16  3600 python bench.py e2e 8192 auto 16
run e2e_f16b 1800 python bench.py e2e 8192 auto 16
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
