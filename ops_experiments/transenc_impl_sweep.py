"""Sweep the shipped fused transenc kernel's attention formulations on-chip.

Measures ops/transenc_pallas.py `encoder_pooled_pallas` (the exact code the
model runs) across (attn_impl, pack, npacks) at bf16, in-jit scan timing.
Complements transenc_kernel_ablate.py (which times a standalone clone with
math ablations that can't ship).

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/transenc_impl_sweep.py [B] [impl@PACKxNPACKS,...]
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

from ccsmeth_tpu.models.config import TransEncConfig
from ccsmeth_tpu.models.transenc import init_transenc
from ccsmeth_tpu.ops.transenc_pallas import encoder_pooled_pallas


def bench(fn, x, iters=10):
    @jax.jit
    def loop(x):
        def body(c, _):
            o = fn(x * (1.0 + c * 1e-6))
            return o[0, 0], o[0, 0]

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8064
    specs = (sys.argv[2].split(",") if len(sys.argv) > 2 else
             ("packed@6x8", "stackhead@6x8", "wsplit@6x8", "headrows@6x8",
              "packed@12x4", "stackhead@12x4", "packed@6x16"))
    cfg = TransEncConfig(dropout_rate=0.0)
    params = jax.device_put(init_transenc(3, cfg))
    x = jax.device_put(np.random.RandomState(0).randn(
        B, cfg.seq_len, cfg.d_model).astype(np.float32) * 0.4)
    ref = np.asarray(encoder_pooled_pallas(params, cfg, x,
                                           compute_dtype=jnp.float32))
    for spec in specs:
        impl, pn = spec.split("@")
        pack, npacks = (int(v) for v in pn.split("x"))
        try:
            got = np.asarray(encoder_pooled_pallas(
                params, cfg, x, compute_dtype=jnp.bfloat16, attn_impl=impl,
                pack=pack, npacks=npacks))
            err = float(np.max(np.abs(got - ref)))
            r = bench(lambda xx, i=impl, p=pack, n=npacks: encoder_pooled_pallas(
                params, cfg, xx, compute_dtype=jnp.bfloat16, attn_impl=i,
                pack=p, npacks=n), x)
            print("{:22s} {:9.0f} rows/s  maxdiff {:.2e}".format(spec, r, err),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print("{:22s} FAILED {}".format(spec, str(e)[:200]), flush=True)


if __name__ == "__main__":
    main()
