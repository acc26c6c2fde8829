#!/bin/bash
# Round-3 session-2 follow-up queue: waits for tpu_queue_r3b.sh to finish
# (single-client chip), then measures the two new kernel variants on-chip:
#   - stacked BiGRU n_chains sweep (dependency-latency vs VPU-bound verdict)
#   - transenc wqk formulation vs the shipped packed@12x4
set -u
LOG=${1:-/tmp/tpu_r3c}
PREV=${2:-/tmp/tpu_r3b/queue.log}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd /root/repo
# wait until the predecessor's log EXISTS and says done — a missing log means
# it hasn't started yet, not that the chip is free
while ! grep -qs "QUEUE DONE" "$PREV"; do sleep 60; done
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}
run chains  10800 python ops_experiments/bigru_chains_sweep.py 16384 gru
run wqk     10800 python ops_experiments/transenc_impl_sweep.py 8064 \
    packed@12x4,wqk@12x4,wqk@6x8
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
