"""Parallel-overhead gate for the shard_map DDP train step — the measurable
stand-in for the >=85% multi-chip scaling target (SURVEY.md §6) on this host.

True weak scaling (constant per-device batch) cannot be measured with virtual
CPU devices: 8 devices on a fixed 4-core host execute 8x the FLOPs on the same
silicon, so wall time necessarily grows with the device count regardless of how
communication-efficient the step is. What CAN be measured — and what the step
design actually controls — is the parallelization overhead at constant GLOBAL
batch: the 8-device step runs the same total FLOPs as the 1-device step plus
the collectives/dispatch/resharding the DDP decomposition adds. An efficient
step keeps that overhead small; an inefficient one (e.g. the round-1 GSPMD
auto-sharding that resharded the RNN scan's backward accumulators through
replication — "[SPMD] Involuntary full rematerialization") blows it up.

Gate: t_8dev(global B) <= 1.5 x t_1dev(B), best-of-5 per side (generous bound:
the XLA CPU backend parallelizes a single-device matmul across all host cores,
while 8 virtual devices partition the same cores; ratios ~1.0-1.2 are typical
for this step, but CI noise on a shared 4-core box warrants headroom).
"""

import time

import jax
import numpy as np
from jax.sharding import Mesh

from ccsmeth_tpu.models import AttRNNConfig, init_attrnn
from ccsmeth_tpu.training.optim import build_optimizer
from ccsmeth_tpu.training.train import make_train_step


from tests.synth import example_feats as _example_feats


def _step_time(n_devices: int, B: int, reps: int = 5) -> float:
    cfg = AttRNNConfig(num_layers=2, hidden_size=128, dropout_rate=0.1)
    params = init_attrnn(0, cfg)
    tx = build_optimizer("Adam", 1e-3)
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("data",))
    step, _ = make_train_step(cfg, tx, pos_weight=1.0, mesh=mesh)
    opt_state = tx.init(params)
    feats = _example_feats(B)
    labels = np.random.RandomState(0).randint(0, 2, B).astype(np.int32)
    mask = np.ones(B, np.float32)
    rng = jax.random.PRNGKey(0)
    # warm (compile) + sync
    p, o, loss = step(params, opt_state, feats, labels, mask, rng)
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        p, o, loss = step(params, opt_state, feats, labels, mask, rng)
        jax.block_until_ready((p, o, loss))
        best = min(best, time.perf_counter() - t0)
    return best


def test_ddp_step_overhead_constant_global_batch():
    assert jax.device_count() == 8
    B = 256
    t1 = _step_time(1, B)
    t8 = _step_time(8, B)
    ratio = t8 / t1
    print("t_1dev={:.4f}s t_8dev={:.4f}s ratio={:.2f}".format(t1, t8, ratio))
    assert ratio <= 1.5, (
        "8-device DDP step overhead too high: {:.2f}x the 1-device step at the "
        "same global batch".format(ratio))
