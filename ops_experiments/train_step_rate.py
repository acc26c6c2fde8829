"""Device step-rate of the production fused train step (train_step.packed_many,
k steps lax.scanned per dispatch) at a given batch size — the trainm loop's
device ceiling at that shape. One dispatch per timing, so the tunnel's
per-call RPC cancels out.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/train_step_rate.py [B] [k]

(Successor of vjp_tu_sweep.py, whose time-unrolled kernels lost their on-chip
sweep and were removed — capture in captures/r4/vjp_tu.log, PERF.md §1.)
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("CCS_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from ccsmeth_tpu.models import AttRNNConfig, init_attrnn
from ccsmeth_tpu.training.optim import build_optimizer
from ccsmeth_tpu.training.train import make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = AttRNNConfig(dropout_rate=0.1)
    params = init_attrnn(0, cfg)
    tx = build_optimizer("Adam", 1e-3)
    rng0 = np.random.RandomState(0)
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng0.randint(0, 5, (B, 21)).astype(np.float32)
        feats["kpass" + s] = np.full((B, 21), 8.0, np.float32)
        feats["ipd_means" + s] = rng0.randn(B, 21).astype(np.float32)
        feats["pw_means" + s] = rng0.randn(B, 21).astype(np.float32)
        feats["ipd_stds" + s] = np.zeros((B, 21), np.float32)
        feats["pw_stds" + s] = np.zeros((B, 21), np.float32)
        feats["sns" + s] = np.zeros((B, 4), np.float32)
        feats["maps" + s] = np.zeros((B, 21), np.float32)
    labels = rng0.randint(0, 2, B).astype(np.int32)
    mask = np.ones(B, np.float32)

    step, _mesh = make_train_step(cfg, tx, pos_weight=1.0,
                                  rnn_backend="pallas", precision="bf16")
    opt_state = tx.init(params)
    flat = step.pack_batch(feats, labels, mask)
    flats = jax.device_put(np.stack([flat] * k))
    rngs = jax.device_put(np.stack(jax.random.split(jax.random.PRNGKey(1), k)))
    p = jax.device_put(params)
    o = jax.device_put(opt_state)
    _p, _o, losses = step.packed_many(p, o, flats, rngs)
    jax.block_until_ready(losses)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _p, _o, losses = step.packed_many(p, o, flats, rngs)
        jax.block_until_ready(losses)
        best = min(best, time.perf_counter() - t0)
    print("B={} k={}: {:.0f} samples/s ({:.1f} ms/step)".format(
        B, k, B * k / best, 1e3 * best / k), flush=True)


if __name__ == "__main__":
    main()
