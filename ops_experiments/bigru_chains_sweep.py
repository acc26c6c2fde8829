"""Multi-chain interleave sweep for the stacked BiRNN kernel (n_chains).

The whole-network kernel interleaves 2 dependency chains (fwd+bwd). PERF.md §1
attributes the ~46% MXU idle time to the serial chain: while the VPU computes
one chain's gate nonlinearities the MXU has no independent dot ready.
n_chains=M splits the batch tile into M sub-tiles (2*M chains, bit-equal math,
tests/test_pallas_bigru.py). If the bound is dependency latency, more chains
lift MFU; if the VPU is throughput-saturated, the sweep is flat — either way
the verdict ships in PERF.md.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/bigru_chains_sweep.py [B] [gru|lstm]
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


def bench_model(cfg, params, nc, bt, B, iters=10):
    """Full attbigru2s forward with the stacked-kernel chain config
    monkeypatched via the module defaults (what shipping the config would
    change)."""
    from ccsmeth_tpu.models import apply_attrnn
    from ccsmeth_tpu.ops import bigru_pallas as mod

    feats = {}
    rng = np.random.RandomState(0)
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, 21)).astype(np.float32)
        feats["kpass" + s] = np.full((B, 21), 8.0, np.float32)
        feats["ipd_means" + s] = rng.randn(B, 21).astype(np.float32)
        feats["pw_means" + s] = rng.randn(B, 21).astype(np.float32)
        feats["ipd_stds" + s] = np.zeros((B, 21), np.float32)
        feats["pw_stds" + s] = np.zeros((B, 21), np.float32)
        feats["sns" + s] = np.zeros((B, 4), np.float32)
        feats["maps" + s] = np.zeros((B, 21), np.float32)
    feats = {k: jax.device_put(v) for k, v in feats.items()}
    old = (mod.STACK_N_CHAINS, mod.STACK_B_TILE)
    mod.STACK_N_CHAINS, mod.STACK_B_TILE = nc, bt
    try:
        @jax.jit
        def fn(params, feats):
            def body(c, _):
                f = {**feats,
                     "ipd_means": feats["ipd_means"] * 0.999 + c * 1e-3}
                probs = apply_attrnn(params, cfg, f, rnn_backend="pallas",
                                     compute_dtype=jnp.bfloat16)[1]
                return probs[0, 0], probs[0, 1]

            c, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c + ys.sum()

        float(fn(params, feats))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, feats))
            best = min(best, time.perf_counter() - t0)
        return B * iters / best
    finally:
        mod.STACK_N_CHAINS, mod.STACK_B_TILE = old


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    only = sys.argv[2] if len(sys.argv) > 2 else "gru"
    # grid spec: "kernel:N@B,..." and/or "model:N@B,..."
    spec = (sys.argv[3] if len(sys.argv) > 3 else
            "kernel:1@128,1@256,2@256,2@128,4@512")
    cells = [c for c in (("gru", "attbigru2s"), ("lstm", "attbilstm2s"))
             if only in (None, c[0])]
    jobs = []
    for part in spec.split(";"):
        kind, _, lst = part.partition(":")
        for nb in lst.split(","):
            n, _, b = nb.partition("@")
            jobs.append((kind, int(n), int(b)))
    for cell, mt in cells:
        cfg = AttRNNConfig(dropout_rate=0.0, model_type=mt)
        params = jax.device_put(init_attrnn(7, cfg))
        layers = params["rnn"]
        x = jax.device_put(np.random.RandomState(0).randn(B, 21, 11).astype(
            np.float32))
        for kind, nc, bt in jobs:
            try:
                if kind == "model":
                    r = bench_model(cfg, params, nc, bt, B)
                    unit = "sites/s (full model)"
                else:
                    r = bench(lambda xx, n=nc, b=bt: birnn_apply_pallas_stacked(
                        layers, xx, compute_dtype=jnp.bfloat16, b_tile=b,
                        cell=cell, n_chains=n), x)
                    unit = "rows/s"
                print("{:4s} {} n_chains={} b_tile={:3d} {:9.0f} {}"
                      .format(cell, kind, nc, bt, r, unit), flush=True)
            except Exception as e:  # noqa: BLE001
                print("{:4s} {} n_chains={} b_tile={:3d} FAILED {}".format(
                    cell, kind, nc, bt, str(e)[:160]), flush=True)


if __name__ == "__main__":
    main()
