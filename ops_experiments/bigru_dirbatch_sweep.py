"""Interleaved vs direction-batched recurrent chain in the stacked BiRNN kernel.

The whole-network kernel's recurrence serializes 2*NL*L small h@W_hh dots per
tile. dir_batched folds forward+backward into ONE batched dot + one gate block
per timestep — half the serialized ops on the chain, same math (bit-equal,
tests/test_pallas_bigru.py). This measures whether the chain is bound by
per-op dispatch (dirbatch wins) or by MXU/VPU element throughput (neutral).

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/bigru_dirbatch_sweep.py [B]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("CCS_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ccsmeth_tpu.models import AttRNNConfig, init_attrnn
from ccsmeth_tpu.ops.bigru_pallas import birnn_apply_pallas_stacked


def bench(fn, x, iters=10):
    @jax.jit
    def loop(x):
        def body(c, _):
            o, _hn = fn(x * (1.0 + c * 1e-6))
            return o[0, 0, 0], o[0, 0, 0]

        c, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c + ys.sum()

    float(loop(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, time.perf_counter() - t0)
    return x.shape[0] * iters / best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    only = sys.argv[2] if len(sys.argv) > 2 else None  # 'gru' | 'lstm'
    cells = [c for c in (("gru", "attbigru2s"), ("lstm", "attbilstm2s"))
             if only in (None, c[0])]
    for cell, mt in cells:
        cfg = AttRNNConfig(dropout_rate=0.0, model_type=mt)
        layers = init_attrnn(7, cfg)["rnn"]
        x = jax.device_put(np.random.RandomState(0).randn(B, 21, 11).astype(
            np.float32))
        for db in (False, True):
            for bt in ((128, 256) if not db else (128, 256)):
                try:
                    r = bench(lambda xx, d=db, b=bt: birnn_apply_pallas_stacked(
                        layers, xx, compute_dtype=jnp.bfloat16, b_tile=b,
                        cell=cell, dir_batched=d), x)
                    print("{:4s} dirbatch={:d} b_tile={:3d} {:9.0f} rows/s"
                          .format(cell, db, bt, r), flush=True)
                except Exception as e:  # noqa: BLE001
                    print("{:4s} dirbatch={:d} b_tile={:3d} FAILED {}".format(
                        cell, db, bt, str(e)[:160]), flush=True)


if __name__ == "__main__":
    main()
