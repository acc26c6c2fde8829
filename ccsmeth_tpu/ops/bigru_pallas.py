"""Fully-fused bidirectional GRU layer as a Pallas TPU kernel.

The BiGRU recurrence is the hot loop of the call_mods model (SURVEY.md §3.1, "HOT
LOOP #2"). Design (TPU-first, not a torch translation):

  - grid = (batch_tiles, L) with time innermost; the two direction hidden states
    persist across grid steps in VMEM scratch;
  - the layer input streams in TWICE per cell via two BlockSpec index maps (time
    t for the forward direction, L-1-t for the backward one), so BOTH the input
    projection x@W_ih and the recurrent h@W_hh run inside the cell with all
    weights VMEM-resident — no (L, B, 6H) gate tensor is ever materialized in
    HBM (that projection tensor dominated an earlier xp-hoisted design: ~20ms of
    layout-bound HBM traffic per layer vs ~2ms of matmul);
  - per cell and direction: (B_TILE, C) @ (C, 3H) + (B_TILE, H) @ (H, 3H) MXU
    matmuls + VPU gate math; outputs stream out per direction ((L, B, H) fwd in
    time order, bwd reversed — un-flipped once per layer by the caller);
  - gate math matches torch exactly: hg = h@U + b_hh lands b_hh inside the reset
    product for the n gate (same identity as models/rnn.py).

Zero h0 only (this engine's deterministic default); the lax.scan path
(models/rnn.py) remains the reference-semantics implementation (randn-h0 replay,
LSTM, training dropout). compute_dtype=jnp.bfloat16 runs MXU-native with f32
accumulation; f32 keeps fp32-grade numerics at roughly half the throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_lstm_kernel(xf_ref, xb_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                       outf_ref, outb_ref, hf_ref, hb_ref, cf_ref, cb_ref,
                       *, H: int, T: int, compute_dtype):
    """LSTM variant of the fused cell (torch gate order i,f,g,o; carries h AND c
    in VMEM scratch). Zero h0/c0; inference path."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hb_ref[...] = jnp.zeros_like(hb_ref)
        cf_ref[...] = jnp.zeros_like(cf_ref)
        cb_ref[...] = jnp.zeros_like(cb_ref)

    Bt = xf_ref.shape[1]
    C = xf_ref.shape[2]

    def gates_for(x_blk, wih, bih):
        xg = jnp.dot(x_blk.reshape(T * Bt, C).astype(compute_dtype),
                     wih.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bih
        return xg.reshape(T, Bt, 4 * H)

    xg_f = gates_for(xf_ref[...], wih_ref[0], bih_ref[0].astype(jnp.float32))
    xg_b = gates_for(xb_ref[...], wih_ref[1], bih_ref[1].astype(jnp.float32))

    def cell(xg, h, c, whh, bhh):
        g = xg + jnp.dot(h.astype(compute_dtype), whh.astype(compute_dtype),
                         preferred_element_type=jnp.float32) + bhh
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H :])
        c_new = f * c + i * gg
        return o * jnp.tanh(c_new), c_new

    h_f, c_f = hf_ref[...], cf_ref[...]
    h_b, c_b = hb_ref[...], cb_ref[...]
    bhh_f = bhh_ref[0].astype(jnp.float32)
    bhh_b = bhh_ref[1].astype(jnp.float32)
    for j in range(T):
        h_f, c_f = cell(xg_f[j], h_f, c_f, whh_ref[0], bhh_f)
        h_b, c_b = cell(xg_b[T - 1 - j], h_b, c_b, whh_ref[1], bhh_b)
        outf_ref[j] = h_f.astype(outf_ref.dtype)
        outb_ref[j] = h_b.astype(outb_ref.dtype)
    hf_ref[...] = h_f
    hb_ref[...] = h_b
    cf_ref[...] = c_f
    cb_ref[...] = c_b


def _fused_kernel(xf_ref, xb_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                  outf_ref, outb_ref, hf_ref, hb_ref, *, H: int, T: int,
                  compute_dtype):
    """One (batch_tile, time-block) cell handling T consecutive timesteps.

    The T input projections batch into ONE (T*B_TILE, C) MXU matmul up front;
    only the T recurrent (B_TILE, H) matmuls stay sequential — amortizing the
    per-cell grid/DMA overhead that dominates small-C layers.

    xf_ref: (T, B_TILE, C) timesteps tb*T..tb*T+T-1; xb_ref: the mirrored block
    (elements within it are consumed reversed so the bwd direction walks its own
    tau order)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hb_ref[...] = jnp.zeros_like(hb_ref)

    Bt = xf_ref.shape[1]
    C = xf_ref.shape[2]

    def gates_for(x_blk, wih, bih):
        xg = jnp.dot(x_blk.reshape(T * Bt, C).astype(compute_dtype),
                     wih.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bih
        return xg.reshape(T, Bt, 3 * H)

    xg_f = gates_for(xf_ref[...], wih_ref[0], bih_ref[0].astype(jnp.float32))
    xg_b = gates_for(xb_ref[...], wih_ref[1], bih_ref[1].astype(jnp.float32))

    def cell(xg, h, whh, bhh):
        hg = jnp.dot(h.astype(compute_dtype), whh.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bhh
        r = jax.nn.sigmoid(xg[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(xg[:, H : 2 * H] + hg[:, H : 2 * H])
        n = jnp.tanh(xg[:, 2 * H :] + r * hg[:, 2 * H :])
        return (1.0 - z) * n + z * h

    h_f = hf_ref[...]
    h_b = hb_ref[...]
    bhh_f = bhh_ref[0].astype(jnp.float32)
    bhh_b = bhh_ref[1].astype(jnp.float32)
    for j in range(T):
        h_f = cell(xg_f[j], h_f, whh_ref[0], bhh_f)
        # bwd tau = t*T + j corresponds to the mirrored block's element T-1-j
        h_b = cell(xg_b[T - 1 - j], h_b, whh_ref[1], bhh_b)
        outf_ref[j] = h_f.astype(outf_ref.dtype)
        outb_ref[j] = h_b.astype(outb_ref.dtype)
    hf_ref[...] = h_f
    hb_ref[...] = h_b


@functools.partial(jax.jit,
                   static_argnames=("b_tile", "compute_dtype", "interpret",
                                    "t_block", "cell"))
def _fused_layer_call(x_tm, wih, bih, whh, bhh, b_tile, compute_dtype, interpret,
                      t_block=1, cell="gru"):
    """x_tm: (L, B, C) time-major -> (out_f (L, B, H), out_b reversed-time)."""
    L, B, C = x_tm.shape
    n_gates = 4 if cell == "lstm" else 3
    H = whh.shape[-1] // n_gates
    T = t_block if (t_block > 0 and L % t_block == 0) else 1
    nT = L // T
    if B % b_tile != 0:
        pad = b_tile - B % b_tile
        x_tm = jnp.pad(x_tm, ((0, 0), (0, pad), (0, 0)))
    Bp = x_tm.shape[1]
    out_dtype = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    G = n_gates * H
    if cell == "lstm":
        kernel = functools.partial(_fused_lstm_kernel, H=H, T=T,
                                   compute_dtype=compute_dtype)
        scratch = [pltpu.VMEM((b_tile, H), jnp.float32) for _ in range(4)]
    else:
        kernel = functools.partial(_fused_kernel, H=H, T=T,
                                   compute_dtype=compute_dtype)
        scratch = [pltpu.VMEM((b_tile, H), jnp.float32) for _ in range(2)]
    out_f, out_b = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile, nT),
        in_specs=[
            pl.BlockSpec((T, b_tile, C), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, b_tile, C), lambda i, t, nT=nT: (nT - 1 - t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, G), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, G), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, b_tile, H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, b_tile, H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp, H), out_dtype),
            jax.ShapeDtypeStruct((L, Bp, H), out_dtype),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_tm, x_tm, wih, bih, whh, bhh)
    return out_f[:, :B], out_b[:, :B]


def _make_stack_kernel(NL: int, L: int, H: int, cell: str, compute_dtype,
                       dir_batched: bool = False, n_chains: int = 1):
    """Build a whole-network kernel: all NL bidirectional layers over the full
    L-step sequence for one batch tile, entirely in VMEM.

    Compared with the per-layer kernel (grid (batch_tiles, L)), this removes the
    inter-layer HBM round trips for the (L, B, 2H) activations and collapses
    3*L*batch_tiles grid steps into batch_tiles — per-step overhead amortizes
    over 2*NL*L cells. Feasible because call_mods sequences are tiny (L=21,
    SURVEY.md §2.4): the whole activation stack for a 256-row batch tile fits in
    VMEM with room for the f32 gate projections.

    dir_batched=True runs the forward and backward recurrences as ONE batched
    dot + one gate block per timestep ((2, Bt, ·) tensors) instead of two
    interleaved sequential ones — half the serialized ops on the recurrent
    chain, same math.

    n_chains=M splits the batch tile into M sub-tiles whose recurrences
    interleave: 2*M independent dependency chains instead of 2, giving the
    scheduler more MXU work to overlay the VPU gate math of other chains.
    Same math (the recurrence never mixes batch rows); pair with
    b_tile = M * 128 so each chain's recurrent dot keeps a full 128-row M dim.
    """
    n_gates = 4 if cell == "lstm" else 3
    G = n_gates * H

    def kernel(x_ref, *refs):
        out_ref, hn_ref = refs[NL * 4], refs[NL * 4 + 1]
        x = x_ref[...].astype(compute_dtype)  # (L, Bt, C)
        Bt = x.shape[1]

        # gate math stays f32 regardless of compute_dtype (matmuls accumulate
        # f32 anyway; a bf16-activation variant measured SLOWER — the extra
        # casts cost more than the narrower transcendental ops save)
        def gru_cell(xg, hg, h, c):
            r = jax.nn.sigmoid(xg[..., :H] + hg[..., :H])
            z = jax.nn.sigmoid(xg[..., H : 2 * H] + hg[..., H : 2 * H])
            n = jnp.tanh(xg[..., 2 * H :] + r * hg[..., 2 * H :])
            return (1.0 - z) * n + z * h, c

        def lstm_cell(xg, hg, h, c):
            g = xg + hg
            i = jax.nn.sigmoid(g[..., :H])
            f = jax.nn.sigmoid(g[..., H : 2 * H])
            gg = jnp.tanh(g[..., 2 * H : 3 * H])
            o = jax.nn.sigmoid(g[..., 3 * H :])
            c_new = f * c + i * gg
            return o * jnp.tanh(c_new), c_new

        cell_fn = lstm_cell if cell == "lstm" else gru_cell

        if dir_batched:
            for l in range(NL):
                wih, bih, whh, bhh = refs[4 * l : 4 * l + 4]
                C = x.shape[2]
                flat = x.reshape(L * Bt, C)
                xg_f = (jnp.dot(flat, wih[0].astype(compute_dtype),
                                preferred_element_type=jnp.float32)
                        + bih[0].astype(jnp.float32)).reshape(L, Bt, G)
                xg_b = (jnp.dot(flat, wih[1].astype(compute_dtype),
                                preferred_element_type=jnp.float32)
                        + bih[1].astype(jnp.float32)).reshape(L, Bt, G)
                whh_c = whh[...].astype(compute_dtype)          # (2, H, G)
                bhh_c = bhh[...].astype(jnp.float32)[:, None]   # (2, 1, G)
                h = jnp.zeros((2, Bt, H), jnp.float32)
                c = jnp.zeros((2, Bt, H), jnp.float32)
                outs = []
                for j in range(L):
                    hg = jax.lax.dot_general(
                        h.astype(compute_dtype), whh_c,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) + bhh_c
                    xg = jnp.stack([xg_f[j], xg_b[L - 1 - j]])  # (2, Bt, G)
                    h, c = cell_fn(xg, hg, h, c)
                    outs.append(h)
                hn_ref[2 * l] = outs[-1][0].astype(hn_ref.dtype)
                hn_ref[2 * l + 1] = outs[-1][1].astype(hn_ref.dtype)
                x = jnp.stack([
                    jnp.concatenate([outs[t][0], outs[L - 1 - t][1]], axis=-1)
                    for t in range(L)
                ]).astype(compute_dtype)
            out_ref[...] = x.astype(out_ref.dtype)
            return

        M = n_chains
        bc = Bt // M  # rows per chain (sub-tile)

        for l in range(NL):
            wih, bih, whh, bhh = refs[4 * l : 4 * l + 4]
            C = x.shape[2]
            flat = x.reshape(L * Bt, C)
            xg_f = (jnp.dot(flat, wih[0].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
                    + bih[0].astype(jnp.float32)).reshape(L, Bt, G)
            xg_b = (jnp.dot(flat, wih[1].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
                    + bih[1].astype(jnp.float32)).reshape(L, Bt, G)
            bhh_f = bhh[0].astype(jnp.float32)
            bhh_b = bhh[1].astype(jnp.float32)
            whh_f = whh[0].astype(compute_dtype)
            whh_b = whh[1].astype(compute_dtype)
            h_f = [jnp.zeros((bc, H), jnp.float32) for _ in range(M)]
            h_b = [jnp.zeros((bc, H), jnp.float32) for _ in range(M)]
            c_f = [jnp.zeros((bc, H), jnp.float32) for _ in range(M)]
            c_b = [jnp.zeros((bc, H), jnp.float32) for _ in range(M)]
            outs_f = [[] for _ in range(M)]
            outs_b = [[] for _ in range(M)]
            for j in range(L):
                for m in range(M):
                    sl = slice(m * bc, (m + 1) * bc)
                    hg_f = jnp.dot(h_f[m].astype(compute_dtype), whh_f,
                                   preferred_element_type=jnp.float32) + bhh_f
                    h_f[m], c_f[m] = cell_fn(xg_f[j, sl], hg_f, h_f[m], c_f[m])
                    hg_b = jnp.dot(h_b[m].astype(compute_dtype), whh_b,
                                   preferred_element_type=jnp.float32) + bhh_b
                    h_b[m], c_b[m] = cell_fn(xg_b[L - 1 - j, sl], hg_b,
                                             h_b[m], c_b[m])
                    outs_f[m].append(h_f[m])
                    outs_b[m].append(h_b[m])

            def cat_m(outs, t):
                return (outs[0][t] if M == 1 else
                        jnp.concatenate([outs[m][t] for m in range(M)], axis=0))

            hn_ref[2 * l] = cat_m(outs_f, L - 1).astype(hn_ref.dtype)
            hn_ref[2 * l + 1] = cat_m(outs_b, L - 1).astype(hn_ref.dtype)
            # outs_b[m][tau] is the state after consuming timestep L-1-tau; the
            # time-t slice of the layer output pairs outs_f[t] with outs_b[L-1-t]
            x = jnp.stack([
                jnp.concatenate([cat_m(outs_f, t), cat_m(outs_b, L - 1 - t)],
                                axis=-1)
                for t in range(L)
            ]).astype(compute_dtype)
        out_ref[...] = x.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_layers", "b_tile", "compute_dtype",
                                    "interpret", "cell", "dir_batched",
                                    "n_chains"))
def _fused_stack_call(x_tm, flat_weights, n_layers, b_tile, compute_dtype,
                      interpret, cell="gru", dir_batched=False, n_chains=1):
    """x_tm: (L, B, C) -> (out (L, B, 2H) out_dtype, h_n (2*NL, B, H) f32)."""
    L, B, C = x_tm.shape
    NL = n_layers
    n_gates = 4 if cell == "lstm" else 3
    H = flat_weights[2].shape[-1] // n_gates  # whh of layer 0
    if b_tile % n_chains != 0:
        raise ValueError("b_tile must be divisible by n_chains")
    if dir_batched and n_chains != 1:
        # the dir_batched branch returns before the multi-chain code; silently
        # ignoring n_chains would mislabel sweep verdicts
        raise ValueError("n_chains>1 is not supported with dir_batched")
    if B % b_tile != 0:
        pad = b_tile - B % b_tile
        x_tm = jnp.pad(x_tm, ((0, 0), (0, pad), (0, 0)))
    Bp = x_tm.shape[1]
    out_dtype = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    kernel = _make_stack_kernel(NL, L, H, cell, compute_dtype, dir_batched,
                                n_chains)
    w_specs = []
    for li in range(NL):
        Cl = C if li == 0 else 2 * H
        w_specs += [
            pl.BlockSpec((2, Cl, n_gates * H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_gates * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, n_gates * H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_gates * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    out, hn = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile,),
        in_specs=[pl.BlockSpec((L, b_tile, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=(
            pl.BlockSpec((L, b_tile, 2 * H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NL, b_tile, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp, 2 * H), out_dtype),
            jax.ShapeDtypeStruct((2 * NL, Bp, H), jnp.float32),
        ),
        # the whole-stack working set (both directions' f32 gate projections +
        # the layer activations) exceeds the 16MB default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_tm, *flat_weights)
    return out[:, :B], hn[:, :B]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _default_tile(compute_dtype) -> int:
    # VMEM per cell: 2 x-blocks (b_tile*C) + weights (2*(C+H)*3H) + 2 out blocks
    # (b_tile*H) + 2 f32 state scratches + f32 gate intermediates; 512 fits for
    # C<=512, H=256 in bf16 and f32
    return 512


def _layer_weights(layer: dict):
    wih = jnp.stack([jnp.asarray(layer["fwd"]["w_ih"]).T,
                     jnp.asarray(layer["bwd"]["w_ih"]).T])  # (2, C, 3H)
    bih = jnp.stack([jnp.asarray(layer["fwd"]["b_ih"]),
                     jnp.asarray(layer["bwd"]["b_ih"])])
    whh = jnp.stack([jnp.asarray(layer["fwd"]["w_hh"]).T,
                     jnp.asarray(layer["bwd"]["w_hh"]).T])  # (2, H, 3H)
    bhh = jnp.stack([jnp.asarray(layer["fwd"]["b_hh"]),
                     jnp.asarray(layer["bwd"]["b_hh"])])
    return wih, bih, whh, bhh


def bigru_layer_pallas(layer: dict, x: jnp.ndarray, b_tile: int | None = None,
                       compute_dtype=jnp.float32,
                       interpret: bool | None = None,
                       t_block: int = 1) -> jnp.ndarray:
    """One bidirectional GRU layer, zero h0. x: (B, L, C) -> (B, L, 2H) f32.

    Batch-major convenience wrapper; multi-layer callers should use
    birnn_apply_pallas which keeps the time-major layout across layers.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if b_tile is None:
        b_tile = _default_tile(compute_dtype)
    b_tile = min(b_tile, max(8, x.shape[0]))
    wih, bih, whh, bhh = _layer_weights(layer)
    x_tm = jnp.transpose(x, (1, 0, 2))
    if compute_dtype == jnp.bfloat16:
        x_tm = x_tm.astype(jnp.bfloat16)
    out_f, out_b = _fused_layer_call(x_tm, wih, bih, whh, bhh, b_tile,
                                     compute_dtype, interpret, t_block)
    out = jnp.concatenate([out_f, jnp.flip(out_b, axis=0)], axis=-1)
    return jnp.transpose(out, (1, 0, 2)).astype(jnp.float32)


def birnn_apply_pallas(layers: list[dict], x: jnp.ndarray,
                       compute_dtype=jnp.float32, b_tile: int | None = None,
                       interpret: bool | None = None, t_block: int = 1,
                       cell: str = "gru"):
    """Multi-layer BiGRU on the fused kernel; returns (outputs (B, L, 2H) f32,
    h_n in torch layout).

    The time-major (L, B, *) layout is kept across layers — exactly one
    transpose in and one out; the backward stream is un-reversed with a cheap
    flip between layers. h_n is reconstructed from layer outputs (zero-h0 GRU:
    final fwd state = out[t=L-1], final bwd state = out[t=0]).
    """
    if interpret is None:
        interpret = not _on_tpu()
    if b_tile is None:
        b_tile = _default_tile(compute_dtype)
    b_tile = min(b_tile, max(8, x.shape[0]))
    x_tm = jnp.transpose(x, (1, 0, 2))  # (L, B, C)
    if compute_dtype == jnp.bfloat16:
        x_tm = x_tm.astype(jnp.bfloat16)
    h_ns = []
    for ld in layers:
        wih, bih, whh, bhh = _layer_weights(ld)
        out_f, out_b = _fused_layer_call(x_tm, wih, bih, whh, bhh, b_tile,
                                         compute_dtype, interpret, t_block, cell)
        x_tm = jnp.concatenate([out_f, jnp.flip(out_b, axis=0)], axis=-1)
        h_ns.append(jnp.stack([out_f[-1], out_b[-1]], axis=0).astype(jnp.float32))
    out = jnp.transpose(x_tm, (1, 0, 2)).astype(jnp.float32)
    return out, jnp.concatenate(h_ns, axis=0)


# shipped stacked-kernel chain config (ops_experiments/bigru_chains_sweep.py,
# r3 on-chip, B=16384 bf16). Bare kernel: (2,128) 1,071k rows/s, (4,256)
# 1,091k, (8,256) 1,115k vs 1,030k for the r2 default (1,128); (3,192) and
# (16,256)/(8,128) lose, (4,512) fails remote compile. FULL MODEL: 1@128
# 504.7k sites/s, 2@128 524.3k, 4@128 521.5k, 4@256 527.3k, **8@256 541.9k
# (+7.4%, SHIPPED)**. The recurrence is mostly VPU-throughput-bound
# (PERF.md §1); 8 interleaved 32-row chain pairs recover the scheduling
# slack without starving the MXU tiles. Parity is bit-exact
# (tests/test_pallas_bigru.py).
STACK_N_CHAINS = 8
STACK_B_TILE: int | None = 256


def birnn_apply_pallas_stacked(layers: list[dict], x: jnp.ndarray,
                               compute_dtype=jnp.float32,
                               b_tile: int | None = None,
                               interpret: bool | None = None,
                               cell: str = "gru",
                               dir_batched: bool = False,
                               n_chains: int | None = None):
    """Whole-network fused BiRNN: one pallas_call for all layers; same signature
    as birnn_apply_pallas — (outputs (B, L, 2H) f32, h_n (2*NL, B, H) torch
    layout). Zero h0/c0; inference path."""
    if interpret is None:
        interpret = not _on_tpu()
    if n_chains is None:
        # dir_batched has its own chain structure; only an EXPLICIT n_chains>1
        # alongside it is a caller error (guarded in _fused_stack_call)
        n_chains = 1 if dir_batched else STACK_N_CHAINS
    if b_tile is None:
        b_tile = STACK_B_TILE
    if b_tile is None:
        # smaller tile than the per-layer kernel: the full (L, Bt, G) f32 gate
        # projections for both directions live in VMEM at once (128 measured
        # fastest on v5e; 256 within 2%, 512 exceeds the VMEM budget).
        # n_chains>1 keeps 128 rows per chain so each recurrent dot keeps a
        # full-M MXU tile.
        b_tile = 128 * n_chains
    b_tile = min(b_tile, max(8 * n_chains, x.shape[0]))
    b_tile -= b_tile % n_chains  # keep chains equal-sized (pad rows absorb)
    x_tm = jnp.transpose(x, (1, 0, 2))
    if compute_dtype == jnp.bfloat16:
        x_tm = x_tm.astype(jnp.bfloat16)
    flat = []
    for ld in layers:
        flat.extend(_layer_weights(ld))
    out_tm, hn = _fused_stack_call(x_tm, tuple(flat), len(layers), b_tile,
                                   compute_dtype, interpret, cell, dir_batched,
                                   n_chains)
    return jnp.transpose(out_tm, (1, 0, 2)).astype(jnp.float32), hn
