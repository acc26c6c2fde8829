"""Prototype: VMEM-resident multi-head attention core for L=21 (transenc #4).

Tests which in-kernel attention formulation Mosaic accepts and how fast each
runs, before building the whole-encoder fused kernel. The XLA path pads the
(.., 21) scores minor dim to 128 and round-trips everything through HBM; here
scores live only in VMEM.

Variants (all: q,k,v (B, L, d) -> ctx (B, L, d), nhead=4, hd=64):
  xla_ref   — the shipped einsum attention (baseline + numerics oracle)
  pk_bdot   — in-kernel per-head batched dot_general (batch dim = Bt rows)
  pk_vpu_a  — in-kernel per-head broadcast-mul + lane reduce, layout (L, Bt, hd)
  pk_vpu_b  — in-kernel per-head, batch-on-lanes layout (L, hd, Bt)

Run ON TPU:  PYTHONPATH=/root/.axon_site:/root/repo python ops_experiments/attn_kernel_proto.py [batch]
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

L, D, NH = 21, 256, 4
HD = D // NH
INTERPRET = os.environ.get("CCS_FORCE_CPU", "") != ""


def xla_ref(q, k, v):
    B = q.shape[0]
    qh = q.reshape(B, L, NH, HD)
    kh = k.reshape(B, L, NH, HD)
    vh = v.reshape(B, L, NH, HD)
    s = jnp.einsum("blhd,bmhd->bhlm", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(HD)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", w, vh,
                      preferred_element_type=jnp.float32).reshape(B, L, D)


PACK = 6            # samples per block-diagonal pack: 6*21 = 126 <= 128 MXU rows
PL_ROWS = PACK * L  # 126


def _pack_mask():
    r = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 0) // L
    c = jax.lax.broadcasted_iota(jnp.int32, (PL_ROWS, PL_ROWS), 1) // L
    return jnp.where(r == c, 0.0, -1e9).astype(jnp.float32)


def xla_pack(q, k, v):
    """Block-diagonal sample packing: 6 samples -> one dense 126x126 scores
    matmul per head + additive block mask; softmax over the packed axis is
    exactly the per-sample softmax (off-block terms get exp(-1e9) = 0)."""
    B = q.shape[0]
    G = B // PACK
    mask = _pack_mask()
    qh = q.reshape(G, PL_ROWS, NH, HD).transpose(0, 2, 1, 3)
    kh = k.reshape(G, PL_ROWS, NH, HD).transpose(0, 2, 1, 3)
    vh = v.reshape(G, PL_ROWS, NH, HD).transpose(0, 2, 1, 3)
    s = jnp.einsum("ghld,ghmd->ghlm", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(HD)
    w = jax.nn.softmax(s + mask, axis=-1)
    ctx = jnp.einsum("ghlm,ghmd->ghld", w, vh,
                     preferred_element_type=jnp.float32)
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, D)


def _kernel_pack(q_ref, k_ref, v_ref, o_ref, *, npacks):
    # refs: (npacks, PL_ROWS, D) — each pack is 6 samples' rows stacked
    mask = _pack_mask()
    inv = 1.0 / math.sqrt(HD)
    for h in range(NH):
        qh = q_ref[:, :, h * HD:(h + 1) * HD]  # (P, 126, HD)
        kh = k_ref[:, :, h * HD:(h + 1) * HD]
        vh = v_ref[:, :, h * HD:(h + 1) * HD]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s * inv + mask[None], axis=-1)
        ctx = jax.lax.dot_general(w, vh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:, :, h * HD:(h + 1) * HD] = ctx


def _kernel_bdot(q_ref, k_ref, v_ref, o_ref):
    # refs: (Bt, L, D)
    for h in range(NH):
        qh = q_ref[:, :, h * HD:(h + 1) * HD]  # (Bt, L, HD)
        kh = k_ref[:, :, h * HD:(h + 1) * HD]
        vh = v_ref[:, :, h * HD:(h + 1) * HD]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s / math.sqrt(HD), axis=-1)  # (Bt, L, M)
        ctx = jax.lax.dot_general(w, vh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:, :, h * HD:(h + 1) * HD] = ctx


def _kernel_vpu_a(q_ref, k_ref, v_ref, o_ref):
    # refs: (L, Bt, D) time-major; per head: (L, Bt, HD), lanes = HD
    for h in range(NH):
        qh = q_ref[:, :, h * HD:(h + 1) * HD]
        kh = k_ref[:, :, h * HD:(h + 1) * HD]
        vh = v_ref[:, :, h * HD:(h + 1) * HD]
        # scores (L, M, Bt): reduce over lanes (hd)
        s = jnp.sum(qh[:, None] * kh[None], axis=-1) / math.sqrt(HD)
        w = jax.nn.softmax(s, axis=1)  # over M
        # ctx (L, Bt, HD): sum over M of w (L, M, Bt, 1) * v (1, M, Bt, HD)
        ctx = jnp.sum(w[:, :, :, None] * vh[None], axis=1)
        o_ref[:, :, h * HD:(h + 1) * HD] = ctx


def _kernel_vpu_b(q_ref, k_ref, v_ref, o_ref):
    # refs: (L, D, Bt); per head (L, HD, Bt), lanes = Bt (full 128 lanes)
    for h in range(NH):
        qh = q_ref[:, h * HD:(h + 1) * HD, :]
        kh = k_ref[:, h * HD:(h + 1) * HD, :]
        vh = v_ref[:, h * HD:(h + 1) * HD, :]
        # scores (L, M, Bt): reduce over sublane-ish hd axis
        s = jnp.sum(qh[:, None] * kh[None], axis=2) / math.sqrt(HD)
        w = jax.nn.softmax(s, axis=1)
        # ctx (L, HD, Bt): sum over M of w (L, M, 1, Bt) * v (1, M, HD, Bt)
        ctx = jnp.sum(w[:, :, None, :] * vh[None], axis=1)
        o_ref[:, h * HD:(h + 1) * HD, :] = ctx


@functools.partial(jax.jit, static_argnames=("variant", "b_tile"))
def attn_pallas(q, k, v, variant="bdot", b_tile=128):
    B = q.shape[0]
    if variant == "pack":
        npacks = 8  # 48 samples per grid step
        G = B // PACK
        kern = functools.partial(_kernel_pack, npacks=npacks)
        ins = tuple(t.reshape(G, PL_ROWS, D) for t in (q, k, v))
        spec_shape, idx = (npacks, PL_ROWS, D), lambda i: (i, 0, 0)
        out_shape = jax.ShapeDtypeStruct((G, PL_ROWS, D), jnp.float32)
        grid = (G // npacks,)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(spec_shape, idx,
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(spec_shape, idx, memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(*ins)
        return out.reshape(B, L, D)
    if variant == "bdot":
        kern, spec_shape, idx = _kernel_bdot, (b_tile, L, D), lambda i: (i, 0, 0)
        ins = (q, k, v)
        out_shape = jax.ShapeDtypeStruct((B, L, D), jnp.float32)
        grid = (B // b_tile,)
    elif variant == "vpu_a":
        kern, spec_shape, idx = _kernel_vpu_a, (L, b_tile, D), lambda i: (0, i, 0)
        ins = tuple(t.transpose(1, 0, 2) for t in (q, k, v))
        out_shape = jax.ShapeDtypeStruct((L, B, D), jnp.float32)
        grid = (B // b_tile,)
    else:
        kern, spec_shape, idx = _kernel_vpu_b, (L, D, b_tile), lambda i: (0, 0, i)
        ins = tuple(t.transpose(1, 2, 0) for t in (q, k, v))
        out_shape = jax.ShapeDtypeStruct((L, D, B), jnp.float32)
        grid = (B // b_tile,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(spec_shape, idx, memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(spec_shape, idx, memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*ins)
    if variant == "vpu_a":
        out = out.transpose(1, 0, 2)
    elif variant == "vpu_b":
        out = out.transpose(2, 0, 1)
    return out


def bench(fn, args, iters=20):
    @jax.jit
    def loop(*args):
        def body(c, _):
            o = fn(args[0] * (1.0 + c * 1e-6), *args[1:])
            return o[0, 0, 0], o[0, 0, 0]

        c, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c + ys.sum()

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.RandomState(0)
    q, k, v = (jax.device_put(rng.randn(B, L, D).astype(np.float32) * 0.3)
               for _ in range(3))
    q, k, v = jax.device_put(np.asarray(q)), jax.device_put(np.asarray(k)), jax.device_put(np.asarray(v))
    ref = np.asarray(xla_ref(q, k, v))
    t = bench(xla_ref, (q, k, v))
    print("{:10s} {:8.3f} ms  ({:.0f} Mrows/s)".format("xla_ref", t * 1e3,
                                                       B / t / 1e6), flush=True)
    got = np.asarray(xla_pack(q, k, v))
    err = float(np.max(np.abs(got - ref)))
    t = bench(xla_pack, (q, k, v))
    print("{:10s} {:8.3f} ms  ({:.0f} Mrows/s)  maxdiff {:.2e}".format(
        "xla_pack", t * 1e3, B / t / 1e6, err), flush=True)
    for variant in ("pack", "bdot", "vpu_a", "vpu_b"):
        try:
            got = np.asarray(attn_pallas(q, k, v, variant=variant))
            err = float(np.max(np.abs(got - ref)))
            t = bench(lambda a, b, c, va=variant: attn_pallas(a, b, c, variant=va),
                      (q, k, v))
            print("{:10s} {:8.3f} ms  ({:.0f} Mrows/s)  maxdiff {:.2e}".format(
                variant, t * 1e3, B / t / 1e6, err), flush=True)
        except Exception as e:  # noqa: BLE001
            print("{:10s} FAILED: {}".format(variant, str(e)[:300]), flush=True)


if __name__ == "__main__":
    main()
