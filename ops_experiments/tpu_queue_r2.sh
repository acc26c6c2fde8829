#!/bin/bash
# Round-2 TPU measurement queue — run serially (single-client tunnel).
# Usage: bash ops_experiments/tpu_queue_r2.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_r2}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? end $(date +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}

# 1. shipped-kernel formulation sweep (picks the transenc default)
run sweep 4200 python ops_experiments/transenc_impl_sweep.py 8064
# 2. math-ablation variants not in the shipped kernel (bound analysis)
run ablate 3600 python ops_experiments/transenc_kernel_ablate.py 8064 headrows,sitebatch,nomax
# 3. streaming e2e: packed vs unpacked + attribution, two batch sizes
run e2e8k 2400 python bench.py e2e 8192
run e2e32k 2400 python bench.py e2e 32768
# 4. trainm full loop at production scale (packed steps)
run trainm 3600 python ops_experiments/trainm_onchip.py 65536 pallas bf16
# 5. interleaved vs direction-batched recurrent chain (headline kernel)
run dirbatch 3600 python ops_experiments/bigru_dirbatch_sweep.py 16384
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG/queue.log"
