"""transencoder2s throughput experiments (VERDICT r1 #4).

Run ON TPU:  python ops_experiments/transenc_variants.py [batch]

Variants benchmarked with the in-jit lax.scan methodology (bench.py):
  v0_current    — shipped path (separate q/k/v projections, bhlm einsum attn)
  v0_ablate_attn— v0 with attention replaced by identity (time attribution)
  v0_ablate_ffn — v0 with the FFN replaced by identity
  v1_packed     — one (d,3d) QKV projection, same einsum attention
  v2_vpu_attn   — packed QKV + transpose-free broadcast-reduce attention:
                  scores/context as elementwise-mul + sum over hd on the VPU in
                  (B,L,M,h) layout; avoids the (21x64)@(64x21) batched matmuls
                  that pad to full MXU tiles at ~1.3% utilization, and the
                  blhd->bhlm relayouts
  v3_bf16_resid — v2 with the residual stream held in bf16 (LN stats in f32)
"""

import math
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
from ccsmeth_tpu.models.transenc import (_layer_norm, apply_transenc,
                                         init_transenc)
from bench import _example_feats


def _dot(x, w, cd):
    return jnp.dot(x.astype(cd), w.astype(cd), preferred_element_type=jnp.float32)


def mha_einsum(lp, x, nhead, cd, packed):
    B, L, d = x.shape
    hd = d // nhead
    if packed:
        wqkv = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=1)
        bqkv = jnp.concatenate([lp["bq"], lp["bk"], lp["bv"]])
        qkv = _dot(x.reshape(B * L, d), wqkv, cd) + bqkv
        q, k, v = [t.reshape(B, L, nhead, hd) for t in jnp.split(qkv, 3, axis=1)]
    else:
        q = (_dot(x, lp["wq"], cd) + lp["bq"]).reshape(B, L, nhead, hd)
        k = (_dot(x, lp["wk"], cd) + lp["bk"]).reshape(B, L, nhead, hd)
        v = (_dot(x, lp["wv"], cd) + lp["bv"]).reshape(B, L, nhead, hd)
    scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(cd), k.astype(cd),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhlm,bmhd->blhd", w.astype(cd), v.astype(cd),
                     preferred_element_type=jnp.float32).reshape(B, L, d)
    return _dot(ctx, lp["wo"], cd) + lp["bo"]


def mha_vpu(lp, x, nhead, cd):
    """Transpose-free attention: scores and context as broadcast-mul + reduce.
    All tensors stay (B, L, ..) row-major; softmax in f32."""
    B, L, d = x.shape
    hd = d // nhead
    wqkv = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=1)
    bqkv = jnp.concatenate([lp["bq"], lp["bk"], lp["bv"]])
    qkv = _dot(x.reshape(B * L, d), wqkv, cd) + bqkv
    q, k, v = [t.reshape(B, L, nhead, hd).astype(cd)
               for t in jnp.split(qkv, 3, axis=1)]
    # (B, L, 1, h, hd) * (B, 1, M, h, hd) -> sum hd -> (B, L, M, h)
    scores = jnp.sum(q[:, :, None] * k[:, None], axis=-1,
                     dtype=jnp.float32) / math.sqrt(hd)
    w = jax.nn.softmax(scores, axis=2)
    # (B, L, M, h, 1) * (B, 1, M, h, hd) -> sum M -> (B, L, h, hd)
    ctx = jnp.sum(w[..., None].astype(cd) * v[:, None], axis=2,
                  dtype=jnp.float32).reshape(B, L, d)
    return _dot(ctx, lp["wo"], cd) + lp["bo"]


def make_encoder(variant):
    def encoder(params, cfg, x, cd):
        for lp in params["layers"]:
            if variant == "v0_ablate_attn":
                a = x
            elif variant in ("v0_current", "v0_ablate_ffn"):
                a = mha_einsum(lp, x, cfg.nhead, cd, packed=False)
            elif variant == "v1_packed":
                a = mha_einsum(lp, x, cfg.nhead, cd, packed=True)
            else:
                a = mha_vpu(lp, x, cfg.nhead, cd)
            x = _layer_norm(x + a, lp["ln1"])
            if variant == "v0_ablate_ffn":
                h = x
            else:
                h = jax.nn.relu(_dot(x, lp["lin1"]["w"], cd) + lp["lin1"]["b"])
                h = _dot(h, lp["lin2"]["w"], cd) + lp["lin2"]["b"]
            x = _layer_norm(x + h, lp["ln2"])
            if variant == "v3_bf16_resid":
                x = x.astype(jnp.bfloat16)
        return x

    return encoder


def apply_variant(params, cfg, feats, variant, cd):
    import ccsmeth_tpu.models.transenc as te

    orig = te._encoder
    te._encoder = lambda p, c, x, rng, train, cdt=cd: make_encoder(variant)(
        p, c, x, cdt).astype(jnp.float32)
    try:
        return apply_transenc(params, cfg, feats, compute_dtype=cd)
    finally:
        te._encoder = orig


def bench(fn, params, feats, batch, iters=10):
    @jax.jit
    def loop(params, feats):
        def body(carry, _):
            f = {**feats, "ipd_means": feats["ipd_means"] * 0.999 + carry * 1e-3}
            probs = fn(params, f)[1]
            return probs[0, 0], probs[0, 1]

        c, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c + ys.sum()

    float(loop(params, feats))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, feats))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = TransEncConfig(dropout_rate=0.0)
    params = init_transenc(3, cfg)
    params = jax.device_put(params)
    feats = {k: jax.device_put(v) for k, v in _example_feats(batch).items()}

    # reference outputs for numerics check
    ref = np.asarray(apply_transenc(params, cfg, feats)[1])

    results = {}
    for variant in ("v0_current", "v0_ablate_attn", "v0_ablate_ffn",
                    "v1_packed", "v2_vpu_attn"):
        for cd, cdname in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
            fn = lambda p, f: apply_variant(p, cfg, f, variant, cd)
            sps = bench(fn, params, feats, batch)
            if not variant.startswith("v0_ablate"):
                got = np.asarray(fn(params, feats)[1])
                drift = float(np.max(np.abs(got - ref)))
            else:
                drift = float("nan")
            key = "{}_{}".format(variant, cdname)
            results[key] = (sps, drift)
            print("{:26s} {:>10.0f} sites/s   maxdiff {:.2e}".format(
                key, sps, drift), flush=True)
    # v3 only in bf16
    fn = lambda p, f: apply_variant(p, cfg, f, "v3_bf16_resid", jnp.bfloat16)
    sps = bench(fn, params, feats, batch)
    got = np.asarray(fn(params, feats)[1])
    print("{:26s} {:>10.0f} sites/s   maxdiff {:.2e}".format(
        "v3_bf16_resid_bf16", sps, float(np.max(np.abs(got - ref)))), flush=True)


if __name__ == "__main__":
    main()
