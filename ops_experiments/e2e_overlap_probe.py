"""Sweep overlap shapes for the int8 fused streaming path (round 3).

The tunnel wire measures ~41-45 MB/s; with 134 B/site int8 rows the transfer
cap is ~306k sites/s and the fused device-resident rate is ~419k, so the
streaming headline is set by how well puts overlap compute. This sweeps
(megabatch pipeline depth x dispatch-pool width) and the per-batch threaded
path with the SAME compiled executables (persistent cache), warm.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo \
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
    python ops_experiments/e2e_overlap_probe.py [batch] [quant]
"""

import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np

import bench
from ccsmeth_tpu.models import AttRNNConfig, init_attrnn
from ccsmeth_tpu.parallel.mesh import make_predict_fn
from ccsmeth_tpu.pipeline.call_mods import _apply_for


def build(workers, quant):
    import ml_dtypes

    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(1234, cfg)
    return make_predict_fn(_apply_for(cfg, "pallas", "bf16"), params, cfg,
                           transfer_dtype=np.dtype(ml_dtypes.bfloat16),
                           dispatch_workers=workers, kinetics_quant=quant)


def stream_mega(predict, host_batches, n, k, depth):
    groups = [[host_batches[(g * k + j) % len(host_batches)] for j in range(k)]
              for g in range(max(n // k, 1))]
    pending: deque = deque()
    collected = 0
    t0 = time.perf_counter()
    for g in groups:
        pending.append(predict.dispatch_many_async(g))
        while len(pending) > depth:
            arr = predict.collect(pending.popleft())
            collected += arr.shape[0] * arr.shape[1]
    while pending:
        arr = predict.collect(pending.popleft())
        collected += arr.shape[0] * arr.shape[1]
    return collected / (time.perf_counter() - t0)


def stream_batch_threaded(predict, host_batches, n, workers, depth=8):
    pending: deque = deque()
    collected = 0
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for i in range(n):
            pending.append(ex.submit(predict.dispatch,
                                     host_batches[i % len(host_batches)]))
            while len(pending) > depth:
                collected += predict.collect(pending.popleft().result()).shape[0]
        while pending:
            collected += predict.collect(pending.popleft().result()).shape[0]
    return collected / (time.perf_counter() - t0)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    quant = sys.argv[2] if len(sys.argv) > 2 else "int8"
    n = 48
    host_batches = [bench._example_feats(B, seed=s) for s in range(8)]
    for workers in (2, 4):
        predict = build(workers, quant)
        predict(host_batches[0])
        predict.collect(predict.dispatch_many(host_batches[:2] * 4))
        for depth in ((1, 2, 3) if workers in (2, 4) else (1,)):
            best = max(stream_mega(predict, host_batches, n, 8, depth)
                       for _ in range(2))
            print("quant={} workers={} mega depth={}: {:9.0f} sites/s".format(
                quant, workers, depth, best), flush=True)
        for tw in (workers,):
            best = max(stream_batch_threaded(predict, host_batches, n, tw)
                       for _ in range(2))
            print("quant={} per-batch threads={}: {:9.0f} sites/s".format(
                quant, tw, best), flush=True)
        predict.close()


if __name__ == "__main__":
    main()
