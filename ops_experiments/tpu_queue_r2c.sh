#!/bin/bash
# Session-B follow-up: re-measure the shipped async-dispatch + prefetch changes.
set -u
LOG=${1:-/tmp/tpu_r2c}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
run() { local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}
run e2e8k  1500 python bench.py e2e 8192
run trainm 2400 python ops_experiments/trainm_onchip.py 65536 pallas bf16
echo "QUEUE DONE" | tee -a "$LOG/queue.log"
