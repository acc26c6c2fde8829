"""Fused whole-encoder Pallas kernel for transencoder2s (L=21).

Why: at L=21/d=256 the XLA encoder is HBM-bandwidth-bound end to end — every
(.., 21) scores tensor pads its minor dim 21->128 in HBM, and each of the 6
layers round-trips (B, 21, 256) activations several times. Measured on v5e
(ops_experiments/transenc_variants.py): ablating attention alone takes the
model from 103k to 268k sites/s, and the remaining path is still ~60x off the
MXU roofline — it's all memory traffic. This kernel keeps the activation
stack in VMEM across all layers: HBM sees the embedded input once, the
per-layer weights once per batch tile, and a (B, d) mean-pooled output.

Attention is the hard part: per-sample (21x64)@(64x21) matmuls utilize ~2.7%
of the MXU, and the VPU broadcast-reduce alternative measures ~2ms/layer at
B=4096 — both dead ends. Instead, samples are packed block-diagonally: PACK=6
samples stack to 126 rows (one MXU tile), one dense 126x126 scores matmul per
(pack, head) computes all six samples' scores at 1.5x the exact MAC count but
at full MXU density, and an additive block mask (-1e9 off-block) makes the
softmax over 126 columns exactly the per-sample softmax over 21 (after the
row-max subtraction the off-block terms underflow to exp(..) == 0).

Semantics match models/transenc.py `_encoder` + mean pool (torch
TransformerEncoder post-LN semantics, /root/reference/ccsmeth/models.py:
451-620); parity is gated by tests/test_transenc_pallas.py. Inference-only
(dropout-free) — training uses the XLA path, as the reference trains in torch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 6  # samples per block-diagonal attention pack: 6*21 = 126 <= 128


def _stack_layer_params(layers: list[dict]) -> dict:
    """Stack per-layer weight pytrees into (NL, ...) arrays for the kernel."""
    out = {}
    out["wqkv"] = jnp.stack([
        jnp.concatenate([jnp.asarray(lp["wq"]), jnp.asarray(lp["wk"]),
                         jnp.asarray(lp["wv"])], axis=1) for lp in layers])
    out["bqkv"] = jnp.stack([
        jnp.concatenate([jnp.asarray(lp["bq"]), jnp.asarray(lp["bk"]),
                         jnp.asarray(lp["bv"])]) for lp in layers])
    for name, key in (("wo", "wo"), ("bo", "bo")):
        out[name] = jnp.stack([jnp.asarray(lp[key]) for lp in layers])
    out["w1"] = jnp.stack([jnp.asarray(lp["lin1"]["w"]) for lp in layers])
    out["b1"] = jnp.stack([jnp.asarray(lp["lin1"]["b"]) for lp in layers])
    out["w2"] = jnp.stack([jnp.asarray(lp["lin2"]["w"]) for lp in layers])
    out["b2"] = jnp.stack([jnp.asarray(lp["lin2"]["b"]) for lp in layers])
    for ln in ("ln1", "ln2"):
        out[ln + "s"] = jnp.stack([jnp.asarray(lp[ln]["scale"]) for lp in layers])
        out[ln + "b"] = jnp.stack([jnp.asarray(lp[ln]["bias"]) for lp in layers])
    return out


def _make_encoder_kernel(NL: int, L: int, D: int, NH: int, FF: int,
                         npacks: int, compute_dtype):
    HD = D // NH
    R = npacks * PACK * L  # rows per tile
    PL_ROWS = PACK * L
    inv_sqrt = 1.0 / math.sqrt(HD)

    def kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
               out_ref):
        # block-diagonal additive mask (PL_ROWS, PL_ROWS)
        rb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 0) // L
        cb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 1) // L
        mask = jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)

        def ln(y, scale, bias):
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            return (y - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        x = x_ref[...].astype(jnp.float32)  # (R, D)
        for layer in range(NL):
            qkv = jnp.dot(x.astype(compute_dtype),
                          wqkv_ref[layer].astype(compute_dtype),
                          preferred_element_type=jnp.float32) + bqkv_ref[layer]
            qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
            ctx_heads = []
            for h in range(NH):
                q = qkv_p[:, :, h * HD:(h + 1) * HD]
                k = qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                v = qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                s = jax.lax.dot_general(
                    q.astype(compute_dtype), k.astype(compute_dtype),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s * inv_sqrt + mask[None], axis=-1)
                ctx_heads.append(jax.lax.dot_general(
                    w.astype(compute_dtype), v.astype(compute_dtype),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            ctx = jnp.concatenate(ctx_heads, axis=-1).reshape(R, D)
            a = jnp.dot(ctx.astype(compute_dtype),
                        wo_ref[layer].astype(compute_dtype),
                        preferred_element_type=jnp.float32) + bo_ref[layer]
            x = ln(x + a, ln1s_ref[layer], ln1b_ref[layer])
            h1 = jnp.dot(x.astype(compute_dtype),
                         w1_ref[layer].astype(compute_dtype),
                         preferred_element_type=jnp.float32) + b1_ref[layer]
            h1 = jnp.maximum(h1, 0.0)
            h2 = jnp.dot(h1.astype(compute_dtype),
                         w2_ref[layer].astype(compute_dtype),
                         preferred_element_type=jnp.float32) + b2_ref[layer]
            x = ln(x + h2, ln2s_ref[layer], ln2b_ref[layer])
        # per-sample mean over L: (R, D) -> (npacks*PACK, L, D) -> mean
        out_ref[...] = jnp.mean(x.reshape(npacks * PACK, L, D), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("L", "NH", "npacks",
                                             "compute_dtype", "interpret"))
def _encoder_call(x, stacked, L, NH, npacks, compute_dtype, interpret):
    """x: (B, L, D) embedded+positioned input -> (B, D) mean-pooled encoding.

    B is padded here to a multiple of PACK*npacks (pad rows cost compute but
    never mix with real samples: attention is block-diagonal per sample)."""
    B, L_, D = x.shape
    NL = stacked["wqkv"].shape[0]
    FF = stacked["w1"].shape[-1]
    tile_samples = PACK * npacks
    Bp = -(-B // tile_samples) * tile_samples
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    R = npacks * PACK * L
    x_rows = x.reshape(Bp * L, D)
    kernel = _make_encoder_kernel(NL, L, D, NH, FF, npacks, compute_dtype)

    def wspec(arr):
        shp = arr.shape
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    names = ("wqkv", "bqkv", "wo", "bo", "w1", "b1", "w2", "b2",
             "ln1s", "ln1b", "ln2s", "ln2b")
    wdtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32)
    weights = [stacked[n].astype(wdtype if n.startswith("w") else jnp.float32)
               for n in names]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile_samples,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [wspec(w) for w in weights],
        out_specs=pl.BlockSpec((tile_samples, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_rows, *weights)
    return out[:B]


def encoder_pooled_pallas(params: dict, cfg, x, compute_dtype=jnp.float32,
                          npacks: int = 8, interpret: bool | None = None):
    """Fused encoder + mean pool: x (B, L, d_model) -> (B, d_model).

    Drop-in for models/transenc.py `_encoder(...)` followed by
    `jnp.mean(x, axis=1)` at inference. interpret=None auto-selects
    interpreter mode off-TPU (CI runs CPU)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    stacked = _stack_layer_params(params["layers"])
    return _encoder_call(x, stacked, cfg.seq_len, cfg.nhead, npacks,
                         compute_dtype, interpret)
