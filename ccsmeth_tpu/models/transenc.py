"""transencoder2s in JAX (parity with ModelTransEnc, /root/reference/ccsmeth/models.py:451-620).

torch TransformerEncoderLayer semantics reproduced: post-LayerNorm ("norm_first=False"),
ReLU feed-forward, standard multi-head scaled-dot attention with packed qkv projections.
All matmuls are MXU-shaped (B*L, d) @ (d, d).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import (
    MAX_KINETICS,
    MAX_MAP,
    MAX_PASSES,
    NEMBED_BASE,
    NEMBED_KINETICS,
    NEMBED_KINETICS_STD,
    NEMBED_MAP,
    NEMBED_PASSES,
    NEMBED_SN,
    N_VOCAB,
)
from .attrnn import _dropout, apply_src_embed, init_src_embed, _lin_init
from .config import TransEncConfig


def init_transenc(seed: int, cfg: TransEncConfig) -> dict:
    # seed may be an int or a duck-typed rng (e.g. a shape-only probe
    # that returns np.empty — used for allocation-free ckpt shape checks)
    rng = seed if hasattr(seed, "uniform") else np.random.RandomState(seed)
    d = cfg.d_model
    nembed_all = NEMBED_BASE + 2 * NEMBED_KINETICS
    params: dict = {
        "seq_embed": rng.uniform(-0.1, 0.1, (N_VOCAB, NEMBED_BASE)).astype(np.float32),
        "ipd_embed": rng.uniform(-0.1, 0.1, (MAX_KINETICS + 1, NEMBED_KINETICS)).astype(np.float32),
        "pw_embed": rng.uniform(-0.1, 0.1, (MAX_KINETICS + 1, NEMBED_KINETICS)).astype(np.float32),
        "pos_embed": rng.normal(0, 1, (cfg.seq_len, d)).astype(np.float32),
        "classifier": [
            _lin_init(rng, d * 2, d * 2, initrange=0.1),
            _lin_init(rng, d * 2, cfg.num_classes, initrange=0.1),
        ],
        "layers": [],
    }
    if cfg.is_npass:
        params["npass_embed"] = rng.uniform(-0.1, 0.1, (MAX_PASSES + 1, NEMBED_PASSES)).astype(np.float32)
        nembed_all += NEMBED_PASSES
    if cfg.is_stds:
        params["ipd_std_embed"] = init_src_embed(rng, 1, NEMBED_KINETICS_STD, 1)
        params["pw_std_embed"] = init_src_embed(rng, 1, NEMBED_KINETICS_STD, 1)
        nembed_all += 2 * NEMBED_KINETICS_STD
    if cfg.is_sn:
        params["sn_embed"] = init_src_embed(rng, 4, NEMBED_SN, 0)
        nembed_all += NEMBED_SN
    if cfg.is_map:
        params["map_embed"] = rng.uniform(-0.1, 0.1, (MAX_MAP, NEMBED_MAP)).astype(np.float32)
        nembed_all += NEMBED_MAP
    params["trans_input"] = init_src_embed(rng, nembed_all, d, 1)

    def lin(fi, fo):
        k = 1.0 / math.sqrt(fi)
        return {"w": rng.uniform(-k, k, (fi, fo)).astype(np.float32),
                "b": rng.uniform(-k, k, (fo,)).astype(np.float32)}

    for _ in range(cfg.num_layers):
        # torch MHA in_proj uses xavier_uniform; exactness not needed for fresh init
        lim = math.sqrt(6.0 / (2 * d))
        params["layers"].append({
            "wq": rng.uniform(-lim, lim, (d, d)).astype(np.float32), "bq": np.zeros(d, np.float32),
            "wk": rng.uniform(-lim, lim, (d, d)).astype(np.float32), "bk": np.zeros(d, np.float32),
            "wv": rng.uniform(-lim, lim, (d, d)).astype(np.float32), "bv": np.zeros(d, np.float32),
            "wo": lin(d, d)["w"], "bo": np.zeros(d, np.float32),
            "lin1": lin(d, cfg.dim_ff), "lin2": lin(cfg.dim_ff, d),
            "ln1": {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)},
            "ln2": {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)},
        })
    return params


def _layer_norm(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dot(x, w, cd):
    """MXU matmul in compute dtype cd with f32 accumulation (bf16 fast path;
    layernorm/softmax/residuals stay f32 either way)."""
    return jnp.dot(x.astype(cd), w.astype(cd), preferred_element_type=jnp.float32)


def _mha(lp, x, nhead, cd):
    B, L, d = x.shape
    hd = d // nhead
    q = (_dot(x, lp["wq"], cd) + lp["bq"]).reshape(B, L, nhead, hd)
    k = (_dot(x, lp["wk"], cd) + lp["bk"]).reshape(B, L, nhead, hd)
    v = (_dot(x, lp["wv"], cd) + lp["bv"]).reshape(B, L, nhead, hd)
    scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(cd), k.astype(cd),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhlm,bmhd->blhd", w.astype(cd), v.astype(cd),
                     preferred_element_type=jnp.float32).reshape(B, L, d)
    return _dot(ctx, lp["wo"], cd) + lp["bo"]


def _encoder(params, cfg: TransEncConfig, x, dropout_rng, train, cd=jnp.float32):
    for lp in params["layers"]:
        a = _mha(lp, x, cfg.nhead, cd)
        if train:
            dropout_rng, sub = jax.random.split(dropout_rng)
            a = _dropout(a, cfg.dropout_rate, sub)
        x = _layer_norm(x + a, lp["ln1"])
        h = jax.nn.relu(_dot(x, lp["lin1"]["w"], cd) + lp["lin1"]["b"])
        if train:
            dropout_rng, sub = jax.random.split(dropout_rng)
            h = _dropout(h, cfg.dropout_rate, sub)
        h = _dot(h, lp["lin2"]["w"], cd) + lp["lin2"]["b"]
        if train:
            dropout_rng, sub = jax.random.split(dropout_rng)
            h = _dropout(h, cfg.dropout_rate, sub)
        x = _layer_norm(x + h, lp["ln2"])
    return x


def _strand_embed(params, cfg: TransEncConfig, f, suffix, dropout_rng, train,
                  cd=jnp.float32, backend="xla"):
    x, dropout_rng = _embed_strand_input(params, cfg, f, suffix, dropout_rng,
                                         train)
    if backend == "pallas" and not train:
        from ..ops.transenc_pallas import encoder_pooled_pallas

        return encoder_pooled_pallas(params, cfg, x, compute_dtype=cd)
    x = _encoder(params, cfg, x, dropout_rng, train, cd)
    return jnp.mean(x, axis=1)  # (N, d) (models.py:601,615)


def _embed_strand_input(params, cfg: TransEncConfig, f, suffix, dropout_rng,
                        train):
    """One strand's embedded + positioned encoder input (N, L, d_model).

    The trans_input src_embed keeps XLA's native conv lowering on every
    path: an im2col-matmul formulation was measured SLOWER on-chip
    (0.50-0.55 vs 0.36 µs/strand-sample, ops_experiments/src_embed_ablate.py
    r4c capture) and was deleted."""
    L = cfg.seq_len
    parts = [
        jnp.take(params["seq_embed"], f["kmer" + suffix].astype(jnp.int32), axis=0),
        jnp.take(params["ipd_embed"], f["ipd_means" + suffix].astype(jnp.int32), axis=0),
        jnp.take(params["pw_embed"], f["pw_means" + suffix].astype(jnp.int32), axis=0),
    ]
    if cfg.is_npass:
        kp = jnp.clip(f["kpass" + suffix], 1, MAX_PASSES).astype(jnp.int32)
        parts.append(jnp.take(params["npass_embed"], kp, axis=0))
    if cfg.is_stds:
        parts.append(apply_src_embed(params["ipd_std_embed"],
                                     f["ipd_stds" + suffix].reshape(-1, L, 1).astype(jnp.float32), train))
        parts.append(apply_src_embed(params["pw_std_embed"],
                                     f["pw_stds" + suffix].reshape(-1, L, 1).astype(jnp.float32), train))
    if cfg.is_sn:
        sns = jnp.broadcast_to(f["sns" + suffix][:, None, :],
                               (f["sns" + suffix].shape[0], L, 4)).astype(jnp.float32)
        parts.append(apply_src_embed(params["sn_embed"], sns, train))
    if cfg.is_map:
        parts.append(jnp.take(params["map_embed"], f["maps" + suffix].astype(jnp.int32), axis=0))
    x = jnp.concatenate(parts, axis=2)
    x = apply_src_embed(params["trans_input"], x, train)
    x = x + params["pos_embed"][None, :, :]
    if train:
        dropout_rng, sub = jax.random.split(dropout_rng)
        x = _dropout(x, cfg.dropout_rate, sub)
    return x, dropout_rng


def apply_transenc(params: dict, cfg: TransEncConfig, feats: dict,
                   dropout_rng=None, train: bool = False,
                   compute_dtype=jnp.float32, backend: str = "xla"):
    """backend='pallas' routes the encoder stack + mean pool through the fused
    whole-encoder kernel (ops/transenc_pallas.py) at inference; training and
    backend='xla' use the reference-shaped XLA encoder."""
    rng1 = rng2 = rng3 = None
    if dropout_rng is not None:
        rng1, rng2, rng3 = jax.random.split(dropout_rng, 3)
    if backend == "pallas" and not train:
        # both strands share the encoder weights, so they batch into ONE
        # fused-kernel call: half the pallas_call dispatches, 2x the grid to
        # amortize weight residency per tile
        from ..ops.transenc_pallas import encoder_pooled_pallas

        x1, _ = _embed_strand_input(params, cfg, feats, "", rng1, train)
        x2, _ = _embed_strand_input(params, cfg, feats, "2", rng2, train)
        B = x1.shape[0]
        x = jnp.concatenate([x1, x2], axis=0)
        if compute_dtype == jnp.bfloat16:
            # halve the kernel's HBM x read + the concat write on the lossy
            # fast path: +5.6% full model on-chip, drift <=1 ML byte
            # (ops_experiments/transenc_fullmodel_ablate.py, r4b capture)
            x = x.astype(jnp.bfloat16)
        pooled = encoder_pooled_pallas(params, cfg, x,
                                       compute_dtype=compute_dtype)
        out1, out2 = pooled[:B], pooled[B:]
    else:
        out1 = _strand_embed(params, cfg, feats, "", rng1, train, compute_dtype,
                             backend)
        out2 = _strand_embed(params, cfg, feats, "2", rng2, train, compute_dtype,
                             backend)
    out = jnp.concatenate([out1, out2], axis=1)
    c0p, c1p = params["classifier"]
    out = jax.nn.relu(jnp.dot(out, c0p["w"], preferred_element_type=jnp.float32) + c0p["b"])
    if train:
        out = _dropout(out, cfg.dropout_rate, rng3)
    logits = jnp.dot(out, c1p["w"], preferred_element_type=jnp.float32) + c1p["b"]
    return logits, jax.nn.softmax(logits, axis=1)
