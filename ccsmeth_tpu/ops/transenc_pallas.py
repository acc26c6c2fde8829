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
B=4096 — both dead ends. Instead, samples are packed block-diagonally: PACK
samples stack to PACK*21 rows (PACK=6 -> 126, one MXU tile), one dense
126x126 scores matmul per (pack, head) computes all six samples' scores at
1.5x the exact MAC count but at full MXU density, and an additive block mask
(-1e9 off-block) makes the softmax over 126 columns exactly the per-sample
softmax over 21 (after the row-max subtraction the off-block terms underflow
to exp(..) == 0).

Three interchangeable attention formulations (same math, different layouts —
measured by ops_experiments/transenc_kernel_ablate.py; the default is the
fastest measured on v5e):
  packed    — per-head lane slices of the fused qkv activation, one batched
              (npacks, PL, PL) dot pair per head (8 dots/layer).
  stackhead — heads folded into the dot batch dim by an axis-0 concat of the
              same lane slices: ONE batched dot pair per layer over
              NH*npacks instances.
  wsplit    — per-head q/k/v computed from pre-split weight matrices
              (D x HD each): no activation lane slices at all; per-head
              context folds into a row-split output projection and
              accumulates. Same MACs, more smaller matmuls.
  headrows  — heads folded into the M/N dims: one dense (NH*PACK*L)^2 score
              dot per pack, 2x the exact MACs but MXU-sized tiles.
  wqk       — query/key projections folded into per-head Wqk = Wq @ Wk^T
              (D x D): scores become (x @ Wqk_h) @ x^T — dense K=D=256 dots
              with NO per-head q/k lane slicing (the G = x @ [Wqk_0|..] dot
              slices at 256-lane alignment, whole-tile extracts). The query
              bias contributes only row-constant score terms (softmax-
              invariant, dropped); the key bias's column term x_j . (Wk bq)
              folds into G as a constant row-vector add (gbias). ~1.5x the
              exact MACs of `packed` but every dot is MXU-dense.

Semantics match models/transenc.py `_encoder` + mean pool (torch
TransformerEncoder post-LN semantics, /root/reference/ccsmeth/models.py:
451-620); parity is gated by tests/test_transenc_pallas.py for every
formulation. Inference-only (dropout-free) — training uses the XLA path, as
the reference trains in torch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# samples per block-diagonal attention pack. 12*21 = 252 rows: 2x the exact
# attention MACs of pack=6 (126<=128) but half as many, MXU-friendlier dots —
# measured fastest on-chip (r3 sweep, B=8064 bf16: packed@12x4 389k samples/s
# vs packed@6x8 340k, stackhead@6x8 355k, wsplit@6x8 362k, stackhead@12x4
# 383k; headrows/6x16 failed remote compile). ops_experiments/
# transenc_impl_sweep.py reproduces the sweep.
PACK = 12
NPACKS = 4  # packs per grid tile (tile = PACK*NPACKS = 48 samples, as before)
ATTN_IMPL = "packed16"  # fastest measured formulation (see module docstring)


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


def _split_head_weights(stacked: dict, NH: int) -> dict:
    """wsplit weight layout: (NL, D, 3D) wqkv -> per-head (NL, NH, D, HD)
    wq/wk/wv + (NL, NH, HD) biases, and (NL, NH, HD, D) row-split wo."""
    NL, D, _ = stacked["wqkv"].shape
    HD = D // NH
    out = {}
    for i, nm in enumerate(("wq", "wk", "wv")):
        w = stacked["wqkv"][:, :, i * D:(i + 1) * D]
        out[nm] = w.reshape(NL, D, NH, HD).transpose(0, 2, 1, 3)
        b = stacked["bqkv"][:, i * D:(i + 1) * D]
        out["b" + nm[1]] = b.reshape(NL, NH, HD)
    out["wo_h"] = stacked["wo"].reshape(NL, NH, HD, D)
    for k in ("bo", "w1", "b1", "w2", "b2", "ln1s", "ln1b", "ln2s", "ln2b"):
        out[k] = stacked[k]
    return out


def _wqk_weights(stacked: dict, NH: int) -> dict:
    """wqk weight layout: per-head folded query-key matrices.

    wqk_cat (NL, D, NH*D): column block h is Wq_h @ Wk_h^T, so
    G = x @ wqk_cat gives every head's score-side projection in one dense
    dot; per-head extraction slices at 256-lane alignment.
    gbias (NL, NH*D): block h is Wk_h @ bq_h — adding it to G makes
    (G_h[i] + Wk_h bq_h) . x[j] == q_i . k_j up to terms constant in j,
    which cancel under the row softmax (see module docstring).
    wv/bv (NL, D, D)/(NL, D): the value projection, unchanged."""
    NL, D, _ = stacked["wqkv"].shape
    HD = D // NH
    wq = stacked["wqkv"][:, :, 0 * D:1 * D]
    wk = stacked["wqkv"][:, :, 1 * D:2 * D]
    bq = stacked["bqkv"][:, 0 * D:1 * D]
    blocks, gb = [], []
    for h in range(NH):
        wq_h = wq[:, :, h * HD:(h + 1) * HD]          # (NL, D, HD)
        wk_h = wk[:, :, h * HD:(h + 1) * HD]
        bq_h = bq[:, h * HD:(h + 1) * HD]             # (NL, HD)
        blocks.append(jnp.einsum("lde,lfe->ldf", wq_h, wk_h))
        gb.append(jnp.einsum("lde,le->ld", wk_h, bq_h))
    out = {"wqk_cat": jnp.concatenate(blocks, axis=-1),
           "gbias": jnp.concatenate(gb, axis=-1),
           "wv": stacked["wqkv"][:, :, 2 * D:3 * D],
           "bv": stacked["bqkv"][:, 2 * D:3 * D]}
    for k in ("wo", "bo", "w1", "b1", "w2", "b2",
              "ln1s", "ln1b", "ln2s", "ln2b"):
        out[k] = stacked[k]
    return out


def _make_encoder_kernel(NL: int, L: int, D: int, NH: int, FF: int,
                         npacks: int, compute_dtype, attn_impl: str,
                         pack: int):
    HD = D // NH
    R = npacks * pack * L  # rows per tile
    PL_ROWS = pack * L
    inv_sqrt = 1.0 / math.sqrt(HD)
    cd = compute_dtype

    def block_mask():
        rb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 0) // L
        cb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 1) // L
        return jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)

    def make_sfm(mask):
        """Per-variant softmax over the packed (…, PL_ROWS) scores.

        packed16 (default) — softmax passes carried at compute_dtype (bf16
        on the fast path): halves VPU traffic for every softmax pass; the
        ctx dot consumes w at cd anyway. At cd=fp32 identical to packed.
        On-chip verdict (r4b sweep + full-model ablation): +0.7% at both
        levels, drift ≤1 ML byte; a mask-MULTIPLY variant ("packmul") was
        measured a wash at both levels and removed.
        """
        if attn_impl == "packed16":
            def sfm(s):
                return jax.nn.softmax((s + mask[None]).astype(cd), axis=-1)
            return sfm
        return lambda s: jax.nn.softmax(s + mask[None], axis=-1)

    def ln(y, scale, bias):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def ffn_ln(x, a, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b):
        x = ln(x + a + bo, ln1s, ln1b)
        h1 = jnp.maximum(jnp.dot(x.astype(cd), w1.astype(cd),
                                 preferred_element_type=jnp.float32) + b1, 0.0)
        h2 = jnp.dot(h1.astype(cd), w2.astype(cd),
                     preferred_element_type=jnp.float32) + b2
        return ln(x + h2, ln2s, ln2b)

    def bdot(a, b, transpose_rhs):
        dims = (((2,), (2 if transpose_rhs else 1,)), ((0,), (0,)))
        return jax.lax.dot_general(a.astype(cd), b.astype(cd), dims,
                                   preferred_element_type=jnp.float32)

    if attn_impl == "wsplit":
        def kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, out_ref):
            mask = block_mask()
            x = x_ref[...].astype(jnp.float32)
            for layer in range(NL):
                xc = x.astype(cd)
                ctx_sum = None
                for h in range(NH):
                    q = (jnp.dot(xc, wq_ref[layer, h],
                                 preferred_element_type=jnp.float32)
                         + bq_ref[layer, h]).reshape(npacks, PL_ROWS, HD)
                    k = (jnp.dot(xc, wk_ref[layer, h],
                                 preferred_element_type=jnp.float32)
                         + bk_ref[layer, h]).reshape(npacks, PL_ROWS, HD)
                    v = (jnp.dot(xc, wv_ref[layer, h],
                                 preferred_element_type=jnp.float32)
                         + bv_ref[layer, h]).reshape(npacks, PL_ROWS, HD)
                    w = jax.nn.softmax(bdot(q, k, True) * inv_sqrt + mask[None],
                                       axis=-1)
                    ctx_h = bdot(w, v, False)
                    part = jnp.dot(ctx_h.reshape(R, HD).astype(cd),
                                   wo_ref[layer, h],
                                   preferred_element_type=jnp.float32)
                    ctx_sum = part if ctx_sum is None else ctx_sum + part
                x = ffn_ln(x, ctx_sum, bo_ref[layer], ln1s_ref[layer],
                           ln1b_ref[layer], w1_ref[layer], b1_ref[layer],
                           w2_ref[layer], b2_ref[layer], ln2s_ref[layer],
                           ln2b_ref[layer])
            out_ref[...] = jnp.mean(x.reshape(npacks * pack, L, D), axis=1)

        return kernel

    if attn_impl == "wqk":
        def kernel(x_ref, wqk_ref, gb_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, ln1s_ref, ln1b_ref,
                   ln2s_ref, ln2b_ref, out_ref):
            mask = block_mask()
            x = x_ref[...].astype(jnp.float32)  # (R, D)
            for layer in range(NL):
                xc = x.astype(cd)
                v = (jnp.dot(xc, wv_ref[layer].astype(cd),
                             preferred_element_type=jnp.float32)
                     + bv_ref[layer])
                g = (jnp.dot(xc, wqk_ref[layer].astype(cd),
                             preferred_element_type=jnp.float32)
                     + gb_ref[layer])                      # (R, NH*D)
                x_p = x.reshape(npacks, PL_ROWS, D)
                v_p = v.reshape(npacks, PL_ROWS, D)
                heads = []
                for h in range(NH):
                    g_h = g[:, h * D:(h + 1) * D].reshape(
                        npacks, PL_ROWS, D)                # 256-lane slice
                    w = jax.nn.softmax(
                        bdot(g_h, x_p, True) * inv_sqrt + mask[None], axis=-1)
                    heads.append(bdot(w, v_p[:, :, h * HD:(h + 1) * HD],
                                      False))
                ctx = jnp.concatenate(heads, axis=-1).reshape(R, D)
                a = jnp.dot(ctx.astype(cd), wo_ref[layer].astype(cd),
                            preferred_element_type=jnp.float32)
                x = ffn_ln(x, a, bo_ref[layer], ln1s_ref[layer],
                           ln1b_ref[layer], w1_ref[layer], b1_ref[layer],
                           w2_ref[layer], b2_ref[layer], ln2s_ref[layer],
                           ln2b_ref[layer])
            out_ref[...] = jnp.mean(x.reshape(npacks * pack, L, D), axis=1)

        return kernel

    def kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
               out_ref):
        mask = block_mask()
        sfm = make_sfm(mask)
        x = x_ref[...].astype(jnp.float32)  # (R, D)
        for layer in range(NL):
            qkv = jnp.dot(x.astype(cd), wqkv_ref[layer].astype(cd),
                          preferred_element_type=jnp.float32) + bqkv_ref[layer]
            qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
            if attn_impl == "headrows":
                # heads folded into the M/N dims: one dense (NH*PL)^2 score
                # dot per pack — 2x the exact MACs but MXU-sized tiles. Row
                # order is (head, sample, position), so the r//L == c//L mask
                # keeps exactly the (same head, same sample) blocks.
                q = jnp.concatenate(
                    [qkv_p[:, :, h * HD:(h + 1) * HD] for h in range(NH)], 1)
                k = jnp.concatenate(
                    [qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                     for h in range(NH)], 1)
                v = jnp.concatenate(
                    [qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                     for h in range(NH)], 1)
                RH = NH * PL_ROWS
                rb = jax.lax.broadcasted_iota(jnp.int32, (RH, RH), 0) // L
                cb = jax.lax.broadcasted_iota(jnp.int32, (RH, RH), 1) // L
                mbig = jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)
                w = jax.nn.softmax(bdot(q, k, True) * inv_sqrt + mbig[None],
                                   axis=-1)
                ctx_f = bdot(w, v, False)
                ctx = jnp.concatenate(
                    [ctx_f[:, h * PL_ROWS:(h + 1) * PL_ROWS]
                     for h in range(NH)], -1).reshape(R, D)
            elif attn_impl == "stackhead":
                # heads folded into the dot batch dim via axis-0 concat
                # (2D-friendly; no 5D transpose): one dot pair per layer
                # over NH*npacks batched instances
                q = jnp.concatenate(
                    [qkv_p[:, :, h * HD:(h + 1) * HD] for h in range(NH)], 0)
                k = jnp.concatenate(
                    [qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                     for h in range(NH)], 0)
                v = jnp.concatenate(
                    [qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                     for h in range(NH)], 0)
                w = jax.nn.softmax(bdot(q, k, True) * inv_sqrt + mask[None],
                                   axis=-1)
                ctx_f = bdot(w, v, False)
                ctx = jnp.concatenate(
                    [ctx_f[h * npacks:(h + 1) * npacks] for h in range(NH)],
                    -1).reshape(R, D)
            else:  # "packed" / "packed16"
                heads = []
                for h in range(NH):
                    q = qkv_p[:, :, h * HD:(h + 1) * HD]
                    k = qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                    v = qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                    w = sfm(bdot(q, k, True) * inv_sqrt)
                    heads.append(bdot(w, v, False))
                ctx = jnp.concatenate(heads, axis=-1).reshape(R, D)
            a = jnp.dot(ctx.astype(cd), wo_ref[layer].astype(cd),
                        preferred_element_type=jnp.float32)
            x = ffn_ln(x, a, bo_ref[layer], ln1s_ref[layer], ln1b_ref[layer],
                       w1_ref[layer], b1_ref[layer], w2_ref[layer],
                       b2_ref[layer], ln2s_ref[layer], ln2b_ref[layer])
        # per-sample mean over L: (R, D) -> (npacks*pack, L, D) -> mean
        out_ref[...] = jnp.mean(x.reshape(npacks * pack, L, D), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("L", "NH", "npacks",
                                             "compute_dtype", "interpret",
                                             "attn_impl", "pack"))
def _encoder_call(x, stacked, L, NH, npacks, compute_dtype, interpret,
                  attn_impl=ATTN_IMPL, pack=PACK):
    """x: (B, L, D) embedded+positioned input -> (B, D) mean-pooled encoding.

    B is padded here to a multiple of pack*npacks (pad rows cost compute but
    never mix with real samples: attention is block-diagonal per sample)."""
    B, L_, D = x.shape
    NL = stacked["wqkv"].shape[0]
    FF = stacked["w1"].shape[-1]
    tile_samples = pack * npacks
    Bp = -(-B // tile_samples) * tile_samples
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    R = npacks * pack * L
    x_rows = x.reshape(Bp * L, D)
    kernel = _make_encoder_kernel(NL, L, D, NH, FF, npacks, compute_dtype,
                                  attn_impl, pack)
    wdtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32)
    if attn_impl == "wsplit":
        sw = _split_head_weights(stacked, NH)
        names = ("wq", "wk", "wv", "bq", "bk", "bv", "wo_h", "bo",
                 "w1", "b1", "w2", "b2", "ln1s", "ln1b", "ln2s", "ln2b")
        weights = [sw[n].astype(wdtype if n.startswith("w") else jnp.float32)
                   for n in names]
    elif attn_impl == "wqk":
        sw = _wqk_weights(stacked, NH)
        names = ("wqk_cat", "gbias", "wv", "bv", "wo", "bo",
                 "w1", "b1", "w2", "b2", "ln1s", "ln1b", "ln2s", "ln2b")
        # gbias adds into the fp32-accumulated G: fp32 like the other biases
        weights = [sw[n].astype(wdtype if n.startswith("w") else jnp.float32)
                   for n in names]
    else:
        names = ("wqkv", "bqkv", "wo", "bo", "w1", "b1", "w2", "b2",
                 "ln1s", "ln1b", "ln2s", "ln2b")
        weights = [stacked[n].astype(wdtype if n.startswith("w")
                                     else jnp.float32) for n in names]

    def wspec(arr):
        shp = arr.shape
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

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
                          npacks: int = NPACKS, interpret: bool | None = None,
                          attn_impl: str = ATTN_IMPL, pack: int = PACK):
    """Fused encoder + mean pool: x (B, L, d_model) -> (B, d_model).

    Drop-in for models/transenc.py `_encoder(...)` followed by
    `jnp.mean(x, axis=1)` at inference. interpret=None auto-selects
    interpreter mode off-TPU (CI runs CPU)."""
    if attn_impl not in ("packed", "packed16", "stackhead", "wsplit",
                        "headrows", "wqk"):
        # fail loudly: the per-head dispatch used to fall through to
        # "packed" on unknown names, silently mislabeling measurements of
        # deleted variants (e.g. the removed "packmul")
        raise ValueError("unknown attn_impl: {!r}".format(attn_impl))
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _encoder_call(x, _stacked_params(params), cfg.seq_len, cfg.nhead,
                         npacks, compute_dtype, interpret, attn_impl, pack)


_STACK_MEMO: dict = {}


def _stacked_params(params: dict) -> dict:
    """Memoized _stack_layer_params for eager callers: the stacked dict
    depends only on the params object, so repeated eager forwards (e.g. bench
    numerics sweeps) reuse it. Inside a jit trace the leaves are tracers and
    stacking stays part of the traced graph (one concat per call — measured
    negligible: ~5 MB against ~40 ms of kernel time per batch)."""
    layers = params["layers"]
    if isinstance(layers[0]["wq"], jax.core.Tracer):
        return _stack_layer_params(layers)
    hit = _STACK_MEMO.get(id(layers))
    if hit is not None and hit[0] is layers:
        return hit[1]
    stacked = _stack_layer_params(layers)
    if any(isinstance(v, jax.core.Tracer)
           for v in jax.tree_util.tree_leaves(stacked)):
        # inside an active trace with CONCRETE closed-over leaves (e.g. a
        # caller jit that captures params by closure): stacking still
        # produces tracers, which must never enter the memo (tracer leak)
        return stacked
    _STACK_MEMO.clear()  # single entry: params objects are long-lived
    _STACK_MEMO[id(layers)] = (layers, stacked)
    return stacked
