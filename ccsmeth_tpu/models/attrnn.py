"""The call_mods / call_freqb model families as pure JAX functions.

Families (semantics parity with /root/reference/ccsmeth/models.py — cited per block):
  apply_attrnn       attbigru2s/attbilstm2s (ModelAttRNN, models.py:17-150) and
                     attbigru2s2/attbilstm2s2 (ModelAttRNN2, models.py:221-382)
  apply_attrnn_ss    attbigru1s/attbilstm1s (ModelAttRNNss, models.py:698-806)
  apply_aggr_attrnn  attbigru/attbilstm aggregate regressor (AggrAttRNN, models.py:625-694)

TPU-first choices:
  - the shared RNN runs BOTH strands in one call (strands stacked on the batch axis) —
    one scan instead of two, doubling MXU occupancy at the same step count;
  - h0 defaults to zeros. The reference draws randn h0 at every forward
    (models.py:77-87) which makes eval nondeterministic; parity tests pass h0
    explicitly to both frameworks. Zero-h0 is this engine's deterministic default.
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
from .attention import apply_attention, init_attention
from .config import AggrConfig, AttRNNConfig
from .rnn import birnn_apply, init_rnn_params


def _lin_init(rng, fan_in, fan_out, initrange=None):
    if initrange is not None:
        w = rng.uniform(-initrange, initrange, (fan_in, fan_out))
        b = np.zeros(fan_out)
    else:
        k = 1.0 / math.sqrt(fan_in)
        w = rng.uniform(-k, k, (fan_in, fan_out))
        b = rng.uniform(-k, k, (fan_out,))
    return {"w": w.astype(np.float32), "b": b.astype(np.float32)}


def _dropout(x, rate, rng):
    if rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------------------
# SrcEmbed conv stack (models.py:153-218) — used by 2s2/transencoder stds/sn inputs
# ---------------------------------------------------------------------------------------


def init_src_embed(rng, input_dim, d_model, block_plus=1):
    def conv(cin, cout, k=3):
        fan_in = cin * k
        kk = 1.0 / math.sqrt(fan_in)
        return rng.uniform(-kk, kk, (cout, cin, k)).astype(np.float32)

    def bn(c):
        return {
            "scale": np.ones(c, np.float32), "bias": np.zeros(c, np.float32),
            "mean": np.zeros(c, np.float32), "var": np.ones(c, np.float32),
        }

    params = {
        "conv1": conv(input_dim, d_model // 2), "bn1": bn(d_model // 2),
        "conv2": conv(d_model // 2, d_model), "bn2": bn(d_model),
        "plus": [{"conv": conv(d_model, d_model), "bn": bn(d_model)} for _ in range(block_plus)],
    }
    return params


def _conv1d_same(x, w):
    """x: (N, L, Cin), w: (Cout, Cin, K) torch layout, stride 1, pad K//2, no bias."""
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)), window_strides=(1,),
        padding=[(w.shape[-1] // 2, w.shape[-1] // 2)],
        dimension_numbers=("NLC", "LIO", "NLC"),
    )


def _bn(x, p, train=False, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
    else:
        mean, var = p["mean"], p["var"]
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _maxpool1d_same(x, k=3):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, 1), (1, 1, 1), [(0, 0), (k // 2, k // 2), (0, 0)]
    )


def apply_src_embed(params, x, train=False):
    """x: (N, L, Cin) -> (N, L, d_model); conv->BN->ReLU->maxpool x2 (+plus blocks)."""
    h = _maxpool1d_same(jax.nn.relu(_bn(_conv1d_same(x, params["conv1"]), params["bn1"], train)))
    h = _maxpool1d_same(jax.nn.relu(_bn(_conv1d_same(h, params["conv2"]), params["bn2"], train)))
    for blk in params["plus"]:
        h = _maxpool1d_same(jax.nn.relu(_bn(_conv1d_same(h, blk["conv"]), blk["bn"], train)))
    return h


# NOTE: an im2col-matmul formulation of this conv stack was prototyped and
# measured on-chip (ops_experiments/src_embed_ablate.py, /tmp/tpu_r4c
# 2026-08-20): 0.50-0.55 µs/strand-sample vs 0.36 µs for XLA's native conv
# lowering — a LOSS at these tiny-spatial shapes (XLA already tiles the
# K*Cin=3*Cin contraction well). Deleted per no-shipped-kernel-without-a-
# winning-number.


# ---------------------------------------------------------------------------------------
# ModelAttRNN / ModelAttRNN2
# ---------------------------------------------------------------------------------------


def init_attrnn(seed: int, cfg: AttRNNConfig) -> dict:
    """Init matching the reference's init_weights (uniform +-0.1 embeds/classifier,
    zero classifier bias; torch defaults elsewhere). Returns a numpy params pytree."""
    # seed may be an int or a duck-typed rng (e.g. a shape-only probe
    # that returns np.empty — used for allocation-free ckpt shape checks)
    rng = seed if hasattr(seed, "uniform") else np.random.RandomState(seed)
    H = cfg.hidden_size
    params: dict = {}
    if cfg.embedded_kinetics:
        params["seq_embed"] = rng.uniform(-0.1, 0.1, (N_VOCAB, NEMBED_BASE)).astype(np.float32)
        params["ipd_embed"] = rng.uniform(-0.1, 0.1, (MAX_KINETICS + 1, NEMBED_KINETICS)).astype(np.float32)
        params["pw_embed"] = rng.uniform(-0.1, 0.1, (MAX_KINETICS + 1, NEMBED_KINETICS)).astype(np.float32)
        nembed_all = NEMBED_BASE + 2 * NEMBED_KINETICS
        if cfg.is_stds:
            params["ipd_std_embed"] = init_src_embed(rng, 1, NEMBED_KINETICS_STD, 1)
            params["pw_std_embed"] = init_src_embed(rng, 1, NEMBED_KINETICS_STD, 1)
            nembed_all += 2 * NEMBED_KINETICS_STD
        if cfg.is_npass:
            params["npass_embed"] = rng.uniform(-0.1, 0.1, (MAX_PASSES + 1, NEMBED_PASSES)).astype(np.float32)
            nembed_all += NEMBED_PASSES
        if cfg.is_sn:
            params["sn_embed"] = init_src_embed(rng, 4, NEMBED_SN, 0)
            nembed_all += NEMBED_SN
        if cfg.is_map:
            params["map_embed"] = rng.uniform(-0.1, 0.1, (MAX_MAP, NEMBED_MAP)).astype(np.float32)
            nembed_all += NEMBED_MAP
        rnn_in = nembed_all
    else:
        params["embed"] = rng.uniform(-0.1, 0.1, (N_VOCAB, NEMBED_BASE)).astype(np.float32)
        rnn_in = NEMBED_BASE + cfg.feas_ccs
    params["rnn"] = init_rnn_params(rng, rnn_in, H, cfg.num_layers, cfg.rnn_cell)
    params["att"] = init_attention(rng, H * 2, H * 2, H)
    fc_in = H * 2 * (2 if cfg.two_strand else 1)
    if cfg.embedded_kinetics:
        params["classifier"] = [
            _lin_init(rng, fc_in, fc_in, initrange=0.1),
            _lin_init(rng, fc_in, cfg.num_classes, initrange=0.1),
        ]
    else:
        params["fc1"] = _lin_init(rng, fc_in, cfg.num_classes, initrange=0.1)
    return params


def _strand_input(params, cfg: AttRNNConfig, f: dict, suffix: str, train: bool):
    """Assemble one strand's (B, L, C) RNN input (models.py:89-123 / 323-356)."""
    L = cfg.seq_len
    kmer = f["kmer" + suffix].astype(jnp.int32)
    if cfg.embedded_kinetics:
        parts = [
            jnp.take(params["seq_embed"], kmer, axis=0),
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
        return jnp.concatenate(parts, axis=2)
    parts = [
        jnp.take(params["embed"], kmer, axis=0),
        f["ipd_means" + suffix].reshape(-1, L, 1).astype(jnp.float32),
        f["pw_means" + suffix].reshape(-1, L, 1).astype(jnp.float32),
    ]
    if cfg.is_npass:
        parts.append(f["kpass" + suffix].reshape(-1, L, 1).astype(jnp.float32))
    if cfg.is_stds:
        parts.append(f["ipd_stds" + suffix].reshape(-1, L, 1).astype(jnp.float32))
        parts.append(f["pw_stds" + suffix].reshape(-1, L, 1).astype(jnp.float32))
    if cfg.is_sn:
        parts.append(jnp.broadcast_to(f["sns" + suffix][:, None, :],
                                      (f["sns" + suffix].shape[0], L, 4)).astype(jnp.float32))
    if cfg.is_map:
        parts.append(f["maps" + suffix].reshape(-1, L, 1).astype(jnp.float32))
    return jnp.concatenate(parts, axis=2)


def _last_layer_query(h_n: jnp.ndarray, num_layers: int, H: int) -> jnp.ndarray:
    """torch h_n (num_layers*2, B, H) -> attention query (B, 1, 2H)
    (models.py:135-137: last layer's [fwd; bwd] states)."""
    last = h_n.reshape(num_layers, 2, -1, H)[-1]  # (2, B, H)
    return jnp.transpose(last, (1, 0, 2)).reshape(-1, 1, 2 * H)


def apply_attrnn(params: dict, cfg: AttRNNConfig, feats: dict,
                 h0: jnp.ndarray | None = None, h0_2: jnp.ndarray | None = None,
                 c0: jnp.ndarray | None = None, c0_2: jnp.ndarray | None = None,
                 dropout_rng=None, train: bool = False,
                 rnn_backend: str = "xla", compute_dtype=jnp.float32):
    """Two-strand forward; returns (logits, probs) like the reference (models.py:150).

    feats keys: kmer,kpass,ipd_means,ipd_stds,pw_means,pw_stds,sns,maps and the same
    with suffix '2' for the reverse strand. h0/h0_2: optional (num_layers*2, B, H).

    rnn_backend='pallas' routes the recurrence through the fused VMEM-resident TPU
    kernel (ops/bigru_pallas.py) — inference fast path (GRU or LSTM, zero h0, no
    inter-layer dropout); training path is GRU via the custom-VJP kernels.
    """
    H = cfg.hidden_size
    B = feats["kmer"].shape[0]
    out1_in = _strand_input(params, cfg, feats, "", train)
    out2_in = _strand_input(params, cfg, feats, "2", train)

    # run both strands through the shared RNN in ONE call (batch-stacked)
    both = jnp.concatenate([out1_in, out2_in], axis=0)
    nl2 = cfg.num_layers * 2
    if rnn_backend in ("pallas", "pallas_layer"):
        if cfg.rnn_cell not in ("gru", "lstm") or h0 is not None or h0_2 is not None:
            raise ValueError("pallas backend: gru/lstm with zero h0 only")
        if rnn_backend == "pallas_layer" and not train:
            # per-layer fused kernel (one pallas_call per layer) — kept callable
            # for on-device numerics gating and kernel ablations (bench.py)
            from ..ops.bigru_pallas import birnn_apply_pallas

            outs, h_n = birnn_apply_pallas(params["rnn"], both,
                                           compute_dtype=compute_dtype,
                                           cell=cfg.rnn_cell)
        elif train:
            # differentiable fused kernels (custom VJP) + inter-layer dropout
            from ..ops.bigru_pallas_vjp import birnn_apply_pallas_trainable

            rnn_rng = None
            if dropout_rng is not None:
                dropout_rng, rnn_rng = jax.random.split(dropout_rng)
            outs, h_n = birnn_apply_pallas_trainable(
                params["rnn"], both, compute_dtype=compute_dtype,
                dropout_rate=cfg.dropout_rate, dropout_rng=rnn_rng,
                cell=cfg.rnn_cell)
        else:
            # whole-network fused kernel: all layers in one pallas_call (the
            # per-layer kernel birnn_apply_pallas remains as the VJP base)
            from ..ops.bigru_pallas import birnn_apply_pallas_stacked

            outs, h_n = birnn_apply_pallas_stacked(params["rnn"], both,
                                                   compute_dtype=compute_dtype,
                                                   cell=cfg.rnn_cell)
        out1, out2 = outs[:B], outs[B:]
        h_n1, h_n2 = h_n[:, :B], h_n[:, B:]
        return _attrnn_head(params, cfg, out1, out2, h_n1, h_n2, dropout_rng, train)
    if h0 is None:
        h0 = jnp.zeros((nl2, B, H), jnp.float32)
    if h0_2 is None:
        h0_2 = jnp.zeros((nl2, B, H), jnp.float32)
    h0_all = jnp.concatenate([h0, h0_2], axis=1)
    if cfg.rnn_cell == "lstm":
        if c0 is None:
            c0 = jnp.zeros((nl2, B, H), jnp.float32)
        if c0_2 is None:
            c0_2 = jnp.zeros((nl2, B, H), jnp.float32)
        c0_all = jnp.concatenate([c0, c0_2], axis=1)
    else:
        c0_all = None
    rnn_rng = None
    if dropout_rng is not None:
        dropout_rng, rnn_rng = jax.random.split(dropout_rng)
    outs, h_n = birnn_apply(params["rnn"], both, h0_all, c0_all, cfg.rnn_cell,
                            cfg.dropout_rate if train else 0.0, rnn_rng)
    out1, out2 = outs[:B], outs[B:]
    h_n1, h_n2 = h_n[:, :B], h_n[:, B:]
    return _attrnn_head(params, cfg, out1, out2, h_n1, h_n2, dropout_rng, train)


def _attrnn_head(params, cfg: AttRNNConfig, out1, out2, h_n1, h_n2, dropout_rng,
                 train):
    """Shared attention + classifier head (models.py:132-150)."""
    H = cfg.hidden_size
    q1 = _last_layer_query(h_n1, cfg.num_layers, H)
    q2 = _last_layer_query(h_n2, cfg.num_layers, H)
    ctx1, _ = apply_attention(params["att"], q1, out1)
    ctx2, _ = apply_attention(params["att"], q2, out2)
    out = jnp.concatenate([ctx1, ctx2], axis=1)  # (B, 4H)

    if cfg.embedded_kinetics:
        c0p, c1p = params["classifier"]
        out = jnp.dot(out, c0p["w"], preferred_element_type=jnp.float32) + c0p["b"]
        out = jax.nn.relu(out)
        if train:
            out = _dropout(out, cfg.dropout_rate, dropout_rng)
        logits = jnp.dot(out, c1p["w"], preferred_element_type=jnp.float32) + c1p["b"]
    else:
        if train:
            out = _dropout(out, cfg.dropout_rate, dropout_rng)
        logits = jnp.dot(out, params["fc1"]["w"], preferred_element_type=jnp.float32) + params["fc1"]["b"]
    return logits, jax.nn.softmax(logits, axis=1)


def apply_attrnn_ss(params: dict, cfg: AttRNNConfig, feats: dict,
                    h0: jnp.ndarray | None = None, c0: jnp.ndarray | None = None,
                    dropout_rng=None, train: bool = False):
    """Single-strand variant (ModelAttRNNss, models.py:770-806)."""
    H = cfg.hidden_size
    B = feats["kmer"].shape[0]
    x = _strand_input(params, cfg, feats, "", train)
    nl2 = cfg.num_layers * 2
    if h0 is None:
        h0 = jnp.zeros((nl2, B, H), jnp.float32)
    if cfg.rnn_cell == "lstm" and c0 is None:
        c0 = jnp.zeros((nl2, B, H), jnp.float32)
    rnn_rng = None
    if dropout_rng is not None:
        dropout_rng, rnn_rng = jax.random.split(dropout_rng)
    out, h_n = birnn_apply(params["rnn"], x, h0, c0, cfg.rnn_cell,
                           cfg.dropout_rate if train else 0.0, rnn_rng)
    q = _last_layer_query(h_n, cfg.num_layers, H)
    ctx, _ = apply_attention(params["att"], q, out)
    if train:
        ctx = _dropout(ctx, cfg.dropout_rate, dropout_rng)
    logits = jnp.dot(ctx, params["fc1"]["w"], preferred_element_type=jnp.float32) + params["fc1"]["b"]
    return logits, jax.nn.softmax(logits, axis=1)


# ---------------------------------------------------------------------------------------
# AggrAttRNN (models.py:625-694)
# ---------------------------------------------------------------------------------------


def init_aggr_attrnn(seed: int, cfg: AggrConfig) -> dict:
    # seed may be an int or a duck-typed rng (e.g. a shape-only probe
    # that returns np.empty — used for allocation-free ckpt shape checks)
    rng = seed if hasattr(seed, "uniform") else np.random.RandomState(seed)
    H = cfg.hidden_size
    return {
        "rnn": init_rnn_params(rng, cfg.binsize + 1, H, cfg.num_layers, cfg.rnn_cell),
        "att": init_attention(rng, H * 2, H * 2, H),
        "fc1": _lin_init(rng, H * 2, cfg.num_classes),
    }


def apply_aggr_attrnn(params: dict, cfg: AggrConfig, offsets: jnp.ndarray,
                      histos: jnp.ndarray, h0: jnp.ndarray | None = None,
                      c0: jnp.ndarray | None = None, dropout_rng=None,
                      train: bool = False) -> jnp.ndarray:
    """offsets: (B, L); histos: (B, L, binsize). Returns raw regression output (B, 1)
    (no softmax; callers clip to [0,1] like call_mods_freq_bam.py:302)."""
    H = cfg.hidden_size
    B = offsets.shape[0]
    x = jnp.concatenate(
        [histos.astype(jnp.float32), offsets.reshape(B, cfg.seq_len, 1).astype(jnp.float32)],
        axis=2,
    )
    nl2 = cfg.num_layers * 2
    if h0 is None:
        h0 = jnp.zeros((nl2, B, H), jnp.float32)
    if cfg.rnn_cell == "lstm" and c0 is None:
        c0 = jnp.zeros((nl2, B, H), jnp.float32)
    out, h_n = birnn_apply(params["rnn"], x, h0, c0, cfg.rnn_cell)
    q = _last_layer_query(h_n, cfg.num_layers, H)
    ctx, _ = apply_attention(params["att"], q, out)
    if train:
        ctx = _dropout(ctx, cfg.dropout_rate, dropout_rng)
    return jnp.dot(ctx, params["fc1"]["w"], preferred_element_type=jnp.float32) + params["fc1"]["b"]
