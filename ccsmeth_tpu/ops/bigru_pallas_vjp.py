"""Custom VJP for the fused BiGRU layer: training runs on the Pallas kernels too.

Forward: the inference kernel augmented to emit the gate activations
(r, z, n, hg_n per direction) as residuals. Backward: a second Pallas kernel walks
time REVERSED (per direction) with the dh carry in VMEM scratch and the weight
gradients accumulated in VMEM output blocks revisited by every grid cell —
TPU grid cells execute sequentially, so += into a fixed-index output block is a
race-free running sum.

GRU backward per step (gate order r,z,n; h = (1-z)n + z h_prev):
  dz  = dh (h_prev - n) z(1-z)
  dn  = dh (1-z)(1-n^2)
  dr  = dn hg_n r(1-r)
  dxg = [dr, dz, dn];  dhg = [dr, dz, dn r]
  dh_prev = dh z + dhg Whh^T;  dx = dxg Wih^T
  dWih += x^T dxg; dWhh += h_prev^T dhg; db += column sums

fp32 accumulation everywhere; compute_dtype only affects the matmul operand type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(xf_ref, xb_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                outf_ref, outb_ref, gatesf_ref, gatesb_ref, hf_ref, hb_ref,
                *, H: int, compute_dtype):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hb_ref[...] = jnp.zeros_like(hb_ref)

    def cell(x_t, h, wih, bih, whh, bhh, out_ref, gates_ref):
        xg = jnp.dot(x_t.astype(compute_dtype), wih.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bih
        hg = jnp.dot(h.astype(compute_dtype), whh.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bhh
        r = jax.nn.sigmoid(xg[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(xg[:, H : 2 * H] + hg[:, H : 2 * H])
        hgn = hg[:, 2 * H :]
        n = jnp.tanh(xg[:, 2 * H :] + r * hgn)
        h_new = (1.0 - z) * n + z * h
        out_ref[0] = h_new.astype(out_ref.dtype)
        gates_ref[0] = jnp.concatenate([r, z, n, hgn], axis=1).astype(gates_ref.dtype)
        return h_new

    h_f = cell(xf_ref[0], hf_ref[...], wih_ref[0], bih_ref[0].astype(jnp.float32),
               whh_ref[0], bhh_ref[0].astype(jnp.float32), outf_ref, gatesf_ref)
    h_b = cell(xb_ref[0], hb_ref[...], wih_ref[1], bih_ref[1].astype(jnp.float32),
               whh_ref[1], bhh_ref[1].astype(jnp.float32), outb_ref, gatesb_ref)
    hf_ref[...] = h_f
    hb_ref[...] = h_b


def _bwd_kernel(doutf_ref, doutb_ref, gatesf_ref, gatesb_ref, hprevf_ref,
                hprevb_ref, xf_ref, xb_ref, wih_ref, whh_ref,
                dxf_ref, dxb_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
                dhf_ref, dhb_ref, *, H: int, compute_dtype):
    """Grid (batch_tiles, L); index maps deliver direction-local time REVERSED
    (tau = L-1-t_grid). hprev*_ref holds the direction's output at tau-1 (the
    caller maps tau-1 clamped at 0; the tau==0 mask below zeroes it)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    L = pl.num_programs(1)

    @pl.when(t == 0)
    def _init_carry():
        dhf_ref[...] = jnp.zeros_like(dhf_ref)
        dhb_ref[...] = jnp.zeros_like(dhb_ref)

    @pl.when((i == 0) & (t == 0))
    def _init_grads():
        dwih_ref[...] = jnp.zeros_like(dwih_ref)
        dbih_ref[...] = jnp.zeros_like(dbih_ref)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    first_step = t == L - 1  # tau == 0: h_prev is the zero initial state

    def direction(d, dout_ref, gates_ref, hprev_ref, x_ref, dh_ref, dx_ref):
        g = gates_ref[0].astype(jnp.float32)
        r = g[:, :H]
        z = g[:, H : 2 * H]
        n = g[:, 2 * H : 3 * H]
        hgn = g[:, 3 * H :]
        h_prev = jnp.where(first_step, 0.0, hprev_ref[0].astype(jnp.float32))
        dh_total = dout_ref[0].astype(jnp.float32) + dh_ref[...]
        dz = dh_total * (h_prev - n) * z * (1.0 - z)
        dn = dh_total * (1.0 - z) * (1.0 - n * n)
        dr = dn * hgn * r * (1.0 - r)
        dxg = jnp.concatenate([dr, dz, dn], axis=1)
        dhg = jnp.concatenate([dr, dz, dn * r], axis=1)
        dh_ref[...] = (
            dh_total * z
            + jnp.dot(dhg.astype(compute_dtype),
                      whh_ref[d].astype(compute_dtype).T,
                      preferred_element_type=jnp.float32))
        dx_ref[0] = jnp.dot(dxg.astype(compute_dtype),
                            wih_ref[d].astype(compute_dtype).T,
                            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        x_t = x_ref[0].astype(compute_dtype)
        dwih_ref[d] += jnp.dot(x_t.T, dxg.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
        dwhh_ref[d] += jnp.dot(h_prev.astype(compute_dtype).T,
                               dhg.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
        dbih_ref[d] += jnp.sum(dxg, axis=0)
        dbhh_ref[d] += jnp.sum(dhg, axis=0)

    direction(0, doutf_ref, gatesf_ref, hprevf_ref, xf_ref, dhf_ref, dxf_ref)
    direction(1, doutb_ref, gatesb_ref, hprevb_ref, xb_ref, dhb_ref, dxb_ref)


def _fwd_lstm_kernel(xf_ref, xb_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                     outf_ref, outb_ref, cf_seq_ref, cb_seq_ref,
                     gatesf_ref, gatesb_ref, hf_ref, hb_ref, cf_ref, cb_ref,
                     *, H: int, compute_dtype):
    """LSTM forward emitting residuals: gates (i|f|g|o) and the cell-state
    sequence (backward needs c for tanh(c) and c_prev for df)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hb_ref[...] = jnp.zeros_like(hb_ref)
        cf_ref[...] = jnp.zeros_like(cf_ref)
        cb_ref[...] = jnp.zeros_like(cb_ref)

    def cell(x_t, h, c, wih, bih, whh, bhh, out_ref, c_seq_ref, gates_ref):
        a = (jnp.dot(x_t.astype(compute_dtype), wih.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bih
             + jnp.dot(h.astype(compute_dtype), whh.astype(compute_dtype),
                       preferred_element_type=jnp.float32) + bhh)
        i = jax.nn.sigmoid(a[:, :H])
        f = jax.nn.sigmoid(a[:, H : 2 * H])
        g = jnp.tanh(a[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(a[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        out_ref[0] = h_new.astype(out_ref.dtype)
        c_seq_ref[0] = c_new.astype(c_seq_ref.dtype)
        gates_ref[0] = jnp.concatenate([i, f, g, o], axis=1).astype(gates_ref.dtype)
        return h_new, c_new

    h_f, c_f = cell(xf_ref[0], hf_ref[...], cf_ref[...], wih_ref[0],
                    bih_ref[0].astype(jnp.float32), whh_ref[0],
                    bhh_ref[0].astype(jnp.float32), outf_ref, cf_seq_ref,
                    gatesf_ref)
    h_b, c_b = cell(xb_ref[0], hb_ref[...], cb_ref[...], wih_ref[1],
                    bih_ref[1].astype(jnp.float32), whh_ref[1],
                    bhh_ref[1].astype(jnp.float32), outb_ref, cb_seq_ref,
                    gatesb_ref)
    hf_ref[...] = h_f
    hb_ref[...] = h_b
    cf_ref[...] = c_f
    cb_ref[...] = c_b


def _bwd_lstm_kernel(doutf_ref, doutb_ref, gatesf_ref, gatesb_ref,
                     cf_seq_ref, cb_seq_ref, cprevf_ref, cprevb_ref,
                     hprevf_ref, hprevb_ref, xf_ref, xb_ref, wih_ref, whh_ref,
                     dxf_ref, dxb_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
                     dhf_ref, dhb_ref, dcf_ref, dcb_ref,
                     *, H: int, compute_dtype):
    """LSTM backward per step (see module docstring for the GRU analog):
      tc = tanh(c);  do = dh tc;  dc += dh o (1-tc^2)
      df = dc c_prev; di = dc g; dg = dc i
      da = [di i(1-i), df f(1-f), dg (1-g^2), do o(1-o)]
      dh_prev = da Whh^T; dc_prev = dc f; dx = da Wih^T
      dWih += x^T da; dWhh += h_prev^T da; dbih += col-sum(da); dbhh likewise."""
    i_ = pl.program_id(0)
    t = pl.program_id(1)
    L = pl.num_programs(1)

    @pl.when(t == 0)
    def _init_carry():
        dhf_ref[...] = jnp.zeros_like(dhf_ref)
        dhb_ref[...] = jnp.zeros_like(dhb_ref)
        dcf_ref[...] = jnp.zeros_like(dcf_ref)
        dcb_ref[...] = jnp.zeros_like(dcb_ref)

    @pl.when((i_ == 0) & (t == 0))
    def _init_grads():
        dwih_ref[...] = jnp.zeros_like(dwih_ref)
        dbih_ref[...] = jnp.zeros_like(dbih_ref)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    first_step = t == L - 1  # tau == 0: h_prev/c_prev are the zero init state

    def direction(d, dout_ref, gates_ref, c_seq_ref, cprev_ref, hprev_ref,
                  x_ref, dh_ref, dc_ref, dx_ref):
        g_all = gates_ref[0].astype(jnp.float32)
        ig = g_all[:, :H]
        fg = g_all[:, H : 2 * H]
        gg = g_all[:, 2 * H : 3 * H]
        og = g_all[:, 3 * H :]
        c = c_seq_ref[0].astype(jnp.float32)
        c_prev = jnp.where(first_step, 0.0, cprev_ref[0].astype(jnp.float32))
        h_prev = jnp.where(first_step, 0.0, hprev_ref[0].astype(jnp.float32))
        tc = jnp.tanh(c)
        dh_total = dout_ref[0].astype(jnp.float32) + dh_ref[...]
        do = dh_total * tc
        dc = dh_total * og * (1.0 - tc * tc) + dc_ref[...]
        da = jnp.concatenate([
            dc * gg * ig * (1.0 - ig),
            dc * c_prev * fg * (1.0 - fg),
            dc * ig * (1.0 - gg * gg),
            do * og * (1.0 - og),
        ], axis=1)
        dc_ref[...] = dc * fg
        dh_ref[...] = jnp.dot(da.astype(compute_dtype),
                              whh_ref[d].astype(compute_dtype).T,
                              preferred_element_type=jnp.float32)
        dx_ref[0] = jnp.dot(da.astype(compute_dtype),
                            wih_ref[d].astype(compute_dtype).T,
                            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        x_t = x_ref[0].astype(compute_dtype)
        dwih_ref[d] += jnp.dot(x_t.T, da.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
        dwhh_ref[d] += jnp.dot(h_prev.astype(compute_dtype).T,
                               da.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
        dsum = jnp.sum(da, axis=0)
        dbih_ref[d] += dsum
        dbhh_ref[d] += dsum

    direction(0, doutf_ref, gatesf_ref, cf_seq_ref, cprevf_ref, hprevf_ref,
              xf_ref, dhf_ref, dcf_ref, dxf_ref)
    direction(1, doutb_ref, gatesb_ref, cb_seq_ref, cprevb_ref, hprevb_ref,
              xb_ref, dhb_ref, dcb_ref, dxb_ref)


def _specs_fwd(L, C, H, b_tile):
    return dict(
        in_specs=[
            pl.BlockSpec((1, b_tile, C), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C), lambda i, t, L=L: (L - 1 - t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 3 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 3 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, 4 * H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, 4 * H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )


@functools.partial(jax.jit,
                   static_argnames=("b_tile", "compute_dtype", "interpret"))
def _fwd_call(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret):
    L, B, C = x_tm.shape
    H = whh.shape[-1] // 3
    if B % b_tile != 0:
        pad = b_tile - B % b_tile
        x_tm = jnp.pad(x_tm, ((0, 0), (0, pad), (0, 0)))
    Bp = x_tm.shape[1]
    store = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    kernel = functools.partial(_fwd_kernel, H=H, compute_dtype=compute_dtype)
    specs = _specs_fwd(L, C, H, b_tile)
    out_f, out_b, gates_f, gates_b = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile, L),
        in_specs=specs["in_specs"],
        out_specs=specs["out_specs"],
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp, H), store),
            jax.ShapeDtypeStruct((L, Bp, H), store),
            jax.ShapeDtypeStruct((L, Bp, 4 * H), store),
            jax.ShapeDtypeStruct((L, Bp, 4 * H), store),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_tm, x_tm, wih, bih, whh, bhh)
    return out_f[:, :B], out_b[:, :B], gates_f[:, :B], gates_b[:, :B]


@functools.partial(jax.jit,
                   static_argnames=("b_tile", "compute_dtype", "interpret"))
def _bwd_call(dout_f, dout_b, gates_f, gates_b, out_f, out_b, x_tm, wih, whh,
              b_tile, compute_dtype, interpret):
    L, B, C = x_tm.shape
    H = whh.shape[-1] // 3

    def padb(a):
        if B % b_tile == 0:
            return a
        pad = b_tile - B % b_tile
        return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))

    dout_f, dout_b = padb(dout_f), padb(dout_b)
    gates_f, gates_b = padb(gates_f), padb(gates_b)
    out_f, out_b = padb(out_f), padb(out_b)
    x_tm = padb(x_tm)
    Bp = x_tm.shape[1]
    kernel = functools.partial(_bwd_kernel, H=H, compute_dtype=compute_dtype)

    def rev(i, t, L=L):
        return (L - 1 - t, i, 0)

    def rev_prev(i, t, L=L):
        # direction-local tau-1, clamped; tau==0 is masked to zeros in-kernel
        return (jnp.maximum(L - 1 - t - 1, 0), i, 0)

    store = dout_f.dtype
    dx_f, dx_b, dwih, dbih, dwhh, dbhh = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile, L),
        in_specs=[
            pl.BlockSpec((1, b_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C),
                         lambda i, t, L=L: (t, i, 0),  # x at L-1-tau = t_grid
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 3 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 3 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 3 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 3 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp, C), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, C), jnp.float32),
            jax.ShapeDtypeStruct((2, C, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, 3 * H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dout_f, dout_b, gates_f, gates_b, out_f, out_b, x_tm, x_tm, wih, whh)
    return dx_f[:, :B], dx_b[:, :B], dwih, dbih, dwhh, dbhh


@functools.partial(jax.jit,
                   static_argnames=("b_tile", "compute_dtype", "interpret"))
def _fwd_lstm_call(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret):
    L, B, C = x_tm.shape
    H = whh.shape[-1] // 4
    if B % b_tile != 0:
        pad = b_tile - B % b_tile
        x_tm = jnp.pad(x_tm, ((0, 0), (0, pad), (0, 0)))
    Bp = x_tm.shape[1]
    store = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    kernel = functools.partial(_fwd_lstm_kernel, H=H, compute_dtype=compute_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile, L),
        in_specs=[
            pl.BlockSpec((1, b_tile, C), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C), lambda i, t, L=L: (L - 1 - t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 4 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 4 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, b_tile, w), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM)
            for w in (H, H, H, H, 4 * H, 4 * H)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, Bp, w), store)
            for w in (H, H, H, H, 4 * H, 4 * H)),
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_tm, x_tm, wih, bih, whh, bhh)
    return tuple(o[:, :B] for o in outs)


@functools.partial(jax.jit,
                   static_argnames=("b_tile", "compute_dtype", "interpret"))
def _bwd_lstm_call(dout_f, dout_b, gates_f, gates_b, c_f, c_b, out_f, out_b,
                   x_tm, wih, whh, b_tile, compute_dtype, interpret):
    L, B, C = x_tm.shape
    H = whh.shape[-1] // 4

    def padb(a):
        if B % b_tile == 0:
            return a
        pad = b_tile - B % b_tile
        return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))

    dout_f, dout_b = padb(dout_f), padb(dout_b)
    gates_f, gates_b = padb(gates_f), padb(gates_b)
    c_f, c_b = padb(c_f), padb(c_b)
    out_f, out_b = padb(out_f), padb(out_b)
    x_tm = padb(x_tm)
    Bp = x_tm.shape[1]
    kernel = functools.partial(_bwd_lstm_kernel, H=H, compute_dtype=compute_dtype)

    def rev(i, t, L=L):
        return (L - 1 - t, i, 0)

    def rev_prev(i, t, L=L):
        return (jnp.maximum(L - 1 - t - 1, 0), i, 0)

    dx_f, dx_b, dwih, dbih, dwhh, dbhh = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile, L),
        in_specs=[
            pl.BlockSpec((1, b_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C),
                         lambda i, t, L=L: (t, i, 0),  # mirrored x
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 4 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 4 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 4 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 4 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp, C), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, C), jnp.float32),
            jax.ShapeDtypeStruct((2, C, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, 4 * H), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dout_f, dout_b, gates_f, gates_b, c_f, c_b, c_f, c_b, out_f, out_b,
      x_tm, x_tm, wih, whh)
    return dx_f[:, :B], dx_b[:, :B], dwih, dbih, dwhh, dbhh


# ---------------------------------------------------------------------------------------
# custom_vjp layer
# ---------------------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_bigru_layer_tm(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype,
                         interpret):
    """Differentiable fused layer: x_tm (L, B, C) -> (L, B, 2H) f32 (bwd half in
    direction-local reversed time; caller un-flips).

    A time-unrolled kernel variant (all L steps in one kernel body, n_chains
    interleaved recurrences, register-accumulated weight grads) was built and
    swept on-chip (2026-08-20, ops_experiments/captures/r4/vjp_tu.log): best
    92.4k samples/s vs 94.7k for these per-timestep kernels at the production
    shape (B=2048, k=16 fused steps); larger tiles/chain counts failed TPU
    compilation. It lost, so it was removed (PERF.md §1)."""
    out_f, out_b, _gf, _gb = _fwd_call(x_tm, wih, bih, whh, bhh,
                                       b_tile, compute_dtype, interpret)
    return jnp.concatenate([out_f.astype(jnp.float32),
                            out_b.astype(jnp.float32)], axis=-1)


def _layer_fwd(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret):
    out_f, out_b, gates_f, gates_b = _fwd_call(
        x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret)
    out = jnp.concatenate([out_f.astype(jnp.float32),
                           out_b.astype(jnp.float32)], axis=-1)
    return out, (x_tm, wih, whh, out_f, out_b, gates_f, gates_b)


def _layer_bwd(b_tile, compute_dtype, interpret, res, g):
    x_tm, wih, whh, out_f, out_b, gates_f, gates_b = res
    H = whh.shape[-1] // 3
    dout_f = g[..., :H].astype(out_f.dtype)
    dout_b = g[..., H:].astype(out_b.dtype)
    dx_f, dx_b, dwih, dbih, dwhh, dbhh = _bwd_call(
        dout_f, dout_b, gates_f, gates_b, out_f, out_b, x_tm, wih, whh,
        b_tile, compute_dtype, interpret)
    dx = dx_f + jnp.flip(dx_b, axis=0)
    return (dx.astype(x_tm.dtype), dwih.astype(wih.dtype), dbih, dwhh, dbhh)


fused_bigru_layer_tm.defvjp(_layer_fwd, _layer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_bilstm_layer_tm(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype,
                          interpret):
    """Differentiable fused LSTM layer; same contract as fused_bigru_layer_tm."""
    outs = _fwd_lstm_call(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype,
                          interpret)
    out_f, out_b = outs[0], outs[1]
    return jnp.concatenate([out_f.astype(jnp.float32),
                            out_b.astype(jnp.float32)], axis=-1)


def _lstm_layer_fwd(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret):
    out_f, out_b, c_f, c_b, gates_f, gates_b = _fwd_lstm_call(
        x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret)
    out = jnp.concatenate([out_f.astype(jnp.float32),
                           out_b.astype(jnp.float32)], axis=-1)
    return out, (x_tm, wih, whh, out_f, out_b, c_f, c_b, gates_f, gates_b)


def _lstm_layer_bwd(b_tile, compute_dtype, interpret, res, g):
    x_tm, wih, whh, out_f, out_b, c_f, c_b, gates_f, gates_b = res
    H = whh.shape[-1] // 4
    dout_f = g[..., :H].astype(out_f.dtype)
    dout_b = g[..., H:].astype(out_b.dtype)
    dx_f, dx_b, dwih, dbih, dwhh, dbhh = _bwd_lstm_call(
        dout_f, dout_b, gates_f, gates_b, c_f, c_b, out_f, out_b, x_tm, wih,
        whh, b_tile, compute_dtype, interpret)
    dx = dx_f + jnp.flip(dx_b, axis=0)
    return (dx.astype(x_tm.dtype), dwih.astype(wih.dtype), dbih, dwhh, dbhh)


fused_bilstm_layer_tm.defvjp(_lstm_layer_fwd, _lstm_layer_bwd)


def birnn_apply_pallas_trainable(layers, x, compute_dtype=jnp.float32,
                                 b_tile: int = 256, interpret: bool | None = None,
                                 dropout_rate: float = 0.0, dropout_rng=None,
                                 cell: str = "gru"):
    """Differentiable multi-layer BiRNN (GRU or LSTM) on the fused kernels
    (zero h0/c0).

    Same contract as ops.bigru_pallas.birnn_apply_pallas but with a custom VJP so
    jax.grad runs the Pallas backward kernel instead of differentiating a scan.
    Inter-layer dropout (torch nn.GRU/LSTM semantics: every layer's output but
    the last) is applied in XLA between kernel calls.
    """
    from .bigru_pallas import _layer_weights, _on_tpu

    if interpret is None:
        interpret = not _on_tpu()
    b_tile = min(b_tile, max(8, x.shape[0]))
    layer_fn = fused_bilstm_layer_tm if cell == "lstm" else fused_bigru_layer_tm
    n_gates = 4 if cell == "lstm" else 3
    x_tm = jnp.transpose(x, (1, 0, 2))
    if compute_dtype == jnp.bfloat16:
        x_tm = x_tm.astype(jnp.bfloat16)
    h_ns = []
    H = jnp.asarray(layers[0]["fwd"]["w_hh"]).shape[0] // n_gates
    for li, ld in enumerate(layers):
        wih, bih, whh, bhh = _layer_weights(ld)
        out = layer_fn(x_tm, wih, bih, whh, bhh, b_tile,
                       compute_dtype, interpret)
        out_f = out[..., :H]
        out_b = out[..., H:]
        x_tm = jnp.concatenate([out_f, jnp.flip(out_b, axis=0)], axis=-1)
        if dropout_rate > 0.0 and dropout_rng is not None and li < len(layers) - 1:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, x_tm.shape)
            x_tm = jnp.where(keep, x_tm / (1.0 - dropout_rate), 0.0)
        if compute_dtype == jnp.bfloat16:
            x_tm = x_tm.astype(jnp.bfloat16)
        h_ns.append(jnp.stack([out_f[-1], out_b[-1]], axis=0))
    out_final = jnp.transpose(x_tm, (1, 0, 2)).astype(jnp.float32)
    return out_final, jnp.concatenate(h_ns, axis=0).astype(jnp.float32)
