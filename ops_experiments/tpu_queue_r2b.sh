#!/bin/bash
# Round-2 session-B TPU measurement queue — priorities from VERDICT r1 pendings.
set -u
LOG=${1:-/tmp/tpu_r2b}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}

run e2e8k   1500 python bench.py e2e 8192
run trainm  2400 python ops_experiments/trainm_onchip.py 65536 pallas bf16
run sweep   2400 python ops_experiments/transenc_impl_sweep.py 8064
run dirbatch 2400 python ops_experiments/bigru_dirbatch_sweep.py 16384
run e2e32k  1500 python bench.py e2e 32768
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG/queue.log"
