"""Where does the fused transenc kernel's time go? (follow-up to 164k sites/s)

Clones ops/transenc_pallas.py's kernel with an `attn` switch:
  full      — shipped kernel (per-head lane slices + 8 batched dots/layer)
  none      — attention replaced by identity (ctx = q-part of qkv): measures
              the matmul+LN+FFN floor incl. qkv projection
  slice     — per-head slices happen, dots/softmax skipped (ctx_h = q_h):
              isolates the lane-slice relayout cost
  headfold  — ONE (npacks, PL, NH, HD)->(NH*npacks, PL, HD) transpose per
              q/k/v instead of 12 lane slices; single 2-dot attention pair
              over 32 batched instances

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python ops_experiments/transenc_kernel_ablate.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccsmeth_tpu.models.config import TransEncConfig
from ccsmeth_tpu.models.transenc import init_transenc
from ccsmeth_tpu.ops.transenc_pallas import PACK, _stack_layer_params

INTERPRET = os.environ.get("CCS_FORCE_CPU", "") != ""


def make_kernel_wsplit(NL, L, D, NH, npacks, cd, pack=PACK):
    """Per-head q/k/v from pre-split weights: no activation lane slices, no
    ctx concat — head outputs fold into the output projection (wo split by
    rows) and accumulate. Same MACs as `full`."""
    HD = D // NH
    R = npacks * pack * L
    PL_ROWS = pack * L
    inv_sqrt = 1.0 / math.sqrt(HD)

    def kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
               wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, out_ref):
        rb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 0) // L
        cb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 1) // L
        mask = jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)

        def ln(y, scale, bias):
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            return (y - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

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
                s = jax.lax.dot_general(
                    q.astype(cd), k.astype(cd), (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s * inv_sqrt + mask[None], axis=-1)
                ctx_h = jax.lax.dot_general(
                    w.astype(cd), v.astype(cd), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                part = jnp.dot(ctx_h.reshape(R, HD).astype(cd),
                               wo_ref[layer, h],
                               preferred_element_type=jnp.float32)
                ctx_sum = part if ctx_sum is None else ctx_sum + part
            a = ctx_sum + bo_ref[layer]
            x = ln(x + a, ln1s_ref[layer], ln1b_ref[layer])
            h1 = jnp.maximum(jnp.dot(x.astype(cd), w1_ref[layer].astype(cd),
                                     preferred_element_type=jnp.float32)
                             + b1_ref[layer], 0.0)
            h2 = jnp.dot(h1.astype(cd), w2_ref[layer].astype(cd),
                         preferred_element_type=jnp.float32) + b2_ref[layer]
            x = ln(x + h2, ln2s_ref[layer], ln2b_ref[layer])
        out_ref[...] = jnp.mean(x.reshape(npacks * pack, L, D), axis=1)

    return kernel


def split_head_weights(stacked, NH):
    """(NL, D, 3D) wqkv -> per-head (NL, NH, D, HD) wq/wk/wv (+ (NL, NH, HD)
    biases) and (NL, NH, HD, D) row-split wo."""
    NL, D, _ = stacked["wqkv"].shape
    HD = D // NH
    wqkv = stacked["wqkv"]
    bqkv = stacked["bqkv"]
    out = {}
    for i, nm in enumerate(("wq", "wk", "wv")):
        w = wqkv[:, :, i * D:(i + 1) * D]          # (NL, D, D)
        out[nm] = w.reshape(NL, D, NH, HD).transpose(0, 2, 1, 3)  # (NL,NH,D,HD)
        b = bqkv[:, i * D:(i + 1) * D]
        out["b" + nm[1]] = b.reshape(NL, NH, HD)
    out["wo_h"] = stacked["wo"].reshape(NL, NH, HD, D)
    return out


def make_kernel(NL, L, D, NH, npacks, cd, attn, pack=PACK):
    HD = D // NH
    R = npacks * pack * L
    PL_ROWS = pack * L
    inv_sqrt = 1.0 / math.sqrt(HD)

    def kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
               out_ref):
        rb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 0) // L
        cb = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 1) // L
        mask = jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)

        def ln(y, scale, bias):
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            return (y - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        x = x_ref[...].astype(jnp.float32)
        for layer in range(NL):
            qkv = jnp.dot(x.astype(cd), wqkv_ref[layer].astype(cd),
                          preferred_element_type=jnp.float32) + bqkv_ref[layer]
            if attn == "none":
                ctx = qkv[:, :D]
            elif attn == "slice":
                qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
                ctx = jnp.concatenate(
                    [qkv_p[:, :, h * HD:(h + 1) * HD] for h in range(NH)],
                    axis=-1).reshape(R, D)
            elif attn in ("nosm", "nomax"):
                # full formulation, softmax ablated (nosm: timing-only, wrong
                # math) or computed without the max-subtraction pass (nomax).
                qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
                heads = []
                for h in range(NH):
                    q = qkv_p[:, :, h * HD:(h + 1) * HD]
                    k = qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                    v = qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                    s = jax.lax.dot_general(
                        q.astype(cd), k.astype(cd),
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    if attn == "nosm":
                        w = s * inv_sqrt + mask[None]
                    else:
                        e = jnp.exp(s * inv_sqrt + mask[None])
                        w = e / jnp.sum(e, axis=-1, keepdims=True)
                    heads.append(jax.lax.dot_general(
                        w.astype(cd), v.astype(cd), (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32))
                ctx = jnp.concatenate(heads, axis=-1).reshape(R, D)
            elif attn == "stackhead":
                # heads folded into the dot batch dim via axis-0 concat
                # (2D-friendly; no 5D transpose): 2 big dots per layer.
                qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
                q_all = jnp.concatenate(
                    [qkv_p[:, :, h * HD:(h + 1) * HD] for h in range(NH)], 0)
                k_all = jnp.concatenate(
                    [qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                     for h in range(NH)], 0)
                v_all = jnp.concatenate(
                    [qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                     for h in range(NH)], 0)
                s = jax.lax.dot_general(
                    q_all.astype(cd), k_all.astype(cd),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s * inv_sqrt + mask[None], axis=-1)
                ctx_f = jax.lax.dot_general(
                    w.astype(cd), v_all.astype(cd), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ctx = jnp.concatenate(
                    [ctx_f[h * npacks:(h + 1) * npacks] for h in range(NH)],
                    -1).reshape(R, D)
            elif attn == "sitebatch":
                # block-diagonal structure made explicit: each site's L rows
                # attend only within themselves, so batch sites (and heads)
                # into the dot batch dim — 8x fewer score FLOPs, NO mask.
                nsite = npacks * pack
                qkv_s = qkv.reshape(nsite, L, 3 * D)
                q_all = jnp.concatenate(
                    [qkv_s[:, :, h * HD:(h + 1) * HD] for h in range(NH)], 0)
                k_all = jnp.concatenate(
                    [qkv_s[:, :, D + h * HD:D + (h + 1) * HD]
                     for h in range(NH)], 0)
                v_all = jnp.concatenate(
                    [qkv_s[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                     for h in range(NH)], 0)
                s = jax.lax.dot_general(
                    q_all.astype(cd), k_all.astype(cd),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s * inv_sqrt, axis=-1)
                ctx_f = jax.lax.dot_general(
                    w.astype(cd), v_all.astype(cd), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ctx = jnp.concatenate(
                    [ctx_f[h * nsite:(h + 1) * nsite] for h in range(NH)],
                    -1).reshape(R, D)
            elif attn == "headrows":
                # heads folded into the M/N dims: one dense (4*PL x 4*PL)
                # score dot per pack (batch npacks). 2x the MACs of `full`
                # but in MXU-sized tiles; mask r//L == c//L keeps exactly the
                # (same head, same sample) blocks (row order is (head, sample,
                # position), so r//L enumerates (head, sample) pairs).
                qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
                q_all = jnp.concatenate(
                    [qkv_p[:, :, h * HD:(h + 1) * HD] for h in range(NH)], 1)
                k_all = jnp.concatenate(
                    [qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                     for h in range(NH)], 1)
                v_all = jnp.concatenate(
                    [qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                     for h in range(NH)], 1)
                RH = NH * PL_ROWS
                rbig = jax.lax.broadcasted_iota(jnp.int32, (RH, RH), 0) // L
                cbig = jax.lax.broadcasted_iota(jnp.int32, (RH, RH), 1) // L
                mbig = jnp.where(rbig == cbig, 0.0, -1e9).astype(jnp.float32)
                s = jax.lax.dot_general(
                    q_all.astype(cd), k_all.astype(cd),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s * inv_sqrt + mbig[None], axis=-1)
                ctx_f = jax.lax.dot_general(
                    w.astype(cd), v_all.astype(cd), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ctx = jnp.concatenate(
                    [ctx_f[:, h * PL_ROWS:(h + 1) * PL_ROWS] for h in range(NH)],
                    -1).reshape(R, D)
            elif attn == "headfold":
                qkv_h = qkv.reshape(npacks, PL_ROWS, 3, NH, HD)
                # (npacks, PL, 3, NH, HD) -> (3, NH, npacks, PL, HD)
                qkv_t = qkv_h.transpose(2, 3, 0, 1, 4).reshape(
                    3, NH * npacks, PL_ROWS, HD)
                q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
                s = jax.lax.dot_general(
                    q.astype(cd), k.astype(cd), (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s * inv_sqrt + mask[None], axis=-1)
                ctx_f = jax.lax.dot_general(
                    w.astype(cd), v.astype(cd), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ctx = ctx_f.reshape(NH, npacks, PL_ROWS, HD).transpose(
                    1, 2, 0, 3).reshape(R, D)
            else:  # full — shipped formulation
                qkv_p = qkv.reshape(npacks, PL_ROWS, 3 * D)
                heads = []
                for h in range(NH):
                    q = qkv_p[:, :, h * HD:(h + 1) * HD]
                    k = qkv_p[:, :, D + h * HD:D + (h + 1) * HD]
                    v = qkv_p[:, :, 2 * D + h * HD:2 * D + (h + 1) * HD]
                    s = jax.lax.dot_general(
                        q.astype(cd), k.astype(cd),
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    w = jax.nn.softmax(s * inv_sqrt + mask[None], axis=-1)
                    heads.append(jax.lax.dot_general(
                        w.astype(cd), v.astype(cd), (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32))
                ctx = jnp.concatenate(heads, axis=-1).reshape(R, D)
            a = jnp.dot(ctx.astype(cd), wo_ref[layer].astype(cd),
                        preferred_element_type=jnp.float32) + bo_ref[layer]
            x = ln(x + a, ln1s_ref[layer], ln1b_ref[layer])
            h1 = jnp.maximum(jnp.dot(x.astype(cd), w1_ref[layer].astype(cd),
                                     preferred_element_type=jnp.float32)
                             + b1_ref[layer], 0.0)
            h2 = jnp.dot(h1.astype(cd), w2_ref[layer].astype(cd),
                         preferred_element_type=jnp.float32) + b2_ref[layer]
            x = ln(x + h2, ln2s_ref[layer], ln2b_ref[layer])
        out_ref[...] = jnp.mean(x.reshape(npacks * pack, L, D), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("npacks", "attn", "cd", "pack"))
def run(x, stacked, npacks, attn, cd, pack=PACK):
    B, L, D = x.shape
    NL = stacked["wqkv"].shape[0]
    NH = 4
    tile = pack * npacks
    assert B % tile == 0
    R = npacks * pack * L
    wd = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    if attn == "wsplit":
        kernel = make_kernel_wsplit(NL, L, D, NH, npacks, cd, pack)
        sh = split_head_weights(stacked, NH)
        weights = [sh["wq"].astype(wd), sh["wk"].astype(wd),
                   sh["wv"].astype(wd), sh["bq"], sh["bk"], sh["bv"],
                   sh["wo_h"].astype(wd), stacked["bo"],
                   stacked["w1"].astype(wd), stacked["b1"],
                   stacked["w2"].astype(wd), stacked["b2"],
                   stacked["ln1s"], stacked["ln1b"],
                   stacked["ln2s"], stacked["ln2b"]]
    else:
        kernel = make_kernel(NL, L, D, NH, npacks, cd, attn, pack)
        names = ("wqkv", "bqkv", "wo", "bo", "w1", "b1", "w2", "b2",
                 "ln1s", "ln1b", "ln2s", "ln2b")
        weights = [stacked[n].astype(wd if n.startswith("w") else jnp.float32)
                   for n in names]

    def wspec(arr):
        n = len(arr.shape)
        return pl.BlockSpec(arr.shape, lambda i, _n=n: (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [wspec(w) for w in weights],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x.reshape(B * L, D), *weights)


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
    cfg = TransEncConfig(dropout_rate=0.0)
    params = init_transenc(3, cfg)
    stacked = jax.device_put(_stack_layer_params(params["layers"]))
    x = jax.device_put(np.random.RandomState(0).randn(B, 21, 256).astype(
        np.float32) * 0.4)
    ref = np.asarray(run(x, stacked, 8, "full", jnp.float32))
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "full", "none", "slice", "headfold")
    exact = ("full", "headfold", "nomax", "stackhead", "sitebatch", "wsplit",
             "headrows")
    for spec in variants:
        # "wsplit@12x4" = attn wsplit, PACK 12, npacks 4 (tile stays 48)
        if "@" in spec:
            attn, pn = spec.split("@")
            pack, npacks_list = int(pn.split("x")[0]), (int(pn.split("x")[1]),)
        else:
            attn, pack = spec, PACK
            npacks_list = (8, 16) if attn == "headfold" else (8,)
        for npacks in npacks_list:
            try:
                got = np.asarray(run(x, stacked, npacks, attn, jnp.bfloat16,
                                     pack))
                err = (float(np.max(np.abs(got - ref)))
                       if attn in exact else float("nan"))
                r = bench(lambda xx, a=attn, n=npacks, p=pack: run(
                    xx, stacked, n, a, jnp.bfloat16, p), x)
                print("{:9s} pack={:2d} npacks={:2d} {:9.0f} rows/s  maxdiff"
                      " {:.2e}".format(attn, pack, npacks, r, err), flush=True)
            except Exception as e:  # noqa: BLE001
                print("{:9s} pack={:2d} npacks={:2d} FAILED {}".format(
                    attn, pack, npacks, str(e)[:200]), flush=True)


if __name__ == "__main__":
    main()
