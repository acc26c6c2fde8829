"""Attribute the transenc FULL-MODEL gap (VERDICT r3 next #4): encoder-only
measures ~390-399k samples/s (~195k sites/s) while the full model captured
174.8k sites/s — measure (don't assert) where the ~10% goes:
embedding lookups, the 2-strand concat, the input dtype of the kernel read,
the classifier, and the candidate softmax kernel variants (packed /
packed16, ops/transenc_pallas.py make_sfm).

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/transenc_fullmodel_ablate.py [B] [iters]
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
from ccsmeth_tpu.models.transenc import (
    _embed_strand_input,
    apply_transenc,
    init_transenc,
)
from ccsmeth_tpu.ops.transenc_pallas import encoder_pooled_pallas


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


def bench(make_fn, feats, B, iters=10, perturb_key="ipd_means"):
    """make_fn(feats) -> scalar-reducible output; in-jit scan timing."""
    @jax.jit
    def loop(feats):
        def body(c, _):
            f = {**feats,
                 perturb_key: feats[perturb_key] * 0.999 + c * 1e-3}
            o = make_fn(f)
            return jnp.asarray(o, jnp.float32).reshape(-1)[0], 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(loop(feats))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(feats))
        best = min(best, time.perf_counter() - t0)
    return B * iters / best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = TransEncConfig(dropout_rate=0.0)
    params = jax.device_put(init_transenc(3, cfg))
    feats = {k: jax.device_put(v) for k, v in _example_feats(B).items()}
    cd = jnp.bfloat16

    def embed_cat(f, dtype=None):
        x1, _ = _embed_strand_input(params, cfg, f, "", None, False)
        x2, _ = _embed_strand_input(params, cfg, f, "2", None, False)
        x = jnp.concatenate([x1, x2], axis=0)
        return x.astype(dtype) if dtype is not None else x

    def classifier(pooled, Bv):
        out = jnp.concatenate([pooled[:Bv], pooled[Bv:]], axis=1)
        c0p, c1p = params["classifier"]
        out = jax.nn.relu(jnp.dot(out, c0p["w"],
                                  preferred_element_type=jnp.float32) + c0p["b"])
        logits = jnp.dot(out, c1p["w"],
                         preferred_element_type=jnp.float32) + c1p["b"]
        return jax.nn.softmax(logits, axis=1)

    rows = []

    def report(name, sites_per_s):
        us = 1e6 / sites_per_s
        rows.append((name, sites_per_s, us))
        print("{:28s} {:9.0f} sites/s  {:6.3f} us/site".format(
            name, sites_per_s, us), flush=True)

    # 1. shipped full model
    report("full (shipped)", bench(
        lambda f: apply_transenc(params, cfg, f, compute_dtype=cd,
                                 backend="pallas")[1], feats, B))
    # 2. embedding + concat alone (fp32 out, as shipped)
    report("embed+concat", bench(
        lambda f: jnp.sum(embed_cat(f), axis=(1, 2)), feats, B))
    # 3. embedding + concat cast bf16
    report("embed+concat->bf16", bench(
        lambda f: jnp.sum(embed_cat(f, cd).astype(jnp.float32), axis=(1, 2)),
        feats, B))
    # 4. embed + encoder, no classifier
    report("embed+enc (no clf)", bench(
        lambda f: encoder_pooled_pallas(params, cfg, embed_cat(f),
                                        compute_dtype=cd)[:, 0], feats, B))
    # 5. embed(bf16 x) + encoder + classifier == full with bf16 kernel read
    report("full, bf16 x", bench(
        lambda f: classifier(encoder_pooled_pallas(
            params, cfg, embed_cat(f, cd), compute_dtype=cd), B), feats, B))
    # 6/7. full with the softmax kernel variants (bf16 x)
    for impl in ("packed", "packed16"):
        try:
            report("full, bf16 x, " + impl, bench(
                lambda f, i=impl: classifier(encoder_pooled_pallas(
                    params, cfg, embed_cat(f, cd), compute_dtype=cd,
                    attn_impl=i), B), feats, B))
        except Exception as e:  # noqa: BLE001
            print("{:28s} FAILED {}".format(impl, str(e)[:160]), flush=True)

    # 8. encoder-only on staged pre-embedded input (the 195k reference point)
    x_pre = jax.device_put(np.asarray(
        jax.jit(lambda f: embed_cat(f))(feats)))

    @jax.jit
    def enc_loop(x):
        def body(c, _):
            o = encoder_pooled_pallas(params, cfg, x * (1.0 + c * 1e-6),
                                      compute_dtype=cd)
            return o[0, 0], 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(enc_loop(x_pre))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(enc_loop(x_pre))
        best = min(best, time.perf_counter() - t0)
    enc_samples = x_pre.shape[0] * iters / best
    print("{:28s} {:9.0f} samples/s ({:.0f} sites/s-equiv)".format(
        "enc-only (pre-embedded)", enc_samples, enc_samples / 2), flush=True)

    # on-device numerics: variants vs shipped fp32 full model
    ref = np.asarray(apply_transenc(params, cfg, feats,
                                    compute_dtype=jnp.float32,
                                    backend="pallas")[1])
    for name, fn in (
            ("full bf16 (shipped)", lambda: apply_transenc(
                params, cfg, feats, compute_dtype=cd, backend="pallas")[1]),
            ("bf16 x", lambda: classifier(encoder_pooled_pallas(
                params, cfg, embed_cat(feats, cd), compute_dtype=cd), B)),
            ("bf16 x packed16", lambda: classifier(encoder_pooled_pallas(
                params, cfg, embed_cat(feats, cd), compute_dtype=cd,
                attn_impl="packed16"), B))):
        try:
            d = float(np.max(np.abs(np.asarray(fn()) - ref)))
            print("maxdiff {:20s} {:.5f} ({} ML bytes)".format(
                name, d, int(round(d * 256))), flush=True)
        except Exception as e:  # noqa: BLE001
            print("maxdiff {:20s} FAILED {}".format(name, str(e)[:120]),
                  flush=True)


if __name__ == "__main__":
    main()
