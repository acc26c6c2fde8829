"""Fused bidirectional GRU recurrence as a Pallas TPU kernel.

The BiGRU recurrence is the hot loop of the call_mods model (SURVEY.md §3.1, "HOT
LOOP #2"). Design (TPU-first, not a torch translation):

  1. The input projection x@W_ih (+b_ih) for ALL timesteps and both directions is
     hoisted OUT of the kernel into one large MXU matmul — it has no sequential
     dependency, so it never sits inside the recurrence.
  2. The kernel walks the L sequential steps with the recurrent weights W_hh/b_hh
     (both directions) and both hidden states resident in VMEM: per step, two
     (B_TILE, H) @ (H, 3H) MXU matmuls + VPU gate math, no HBM traffic besides
     the streamed xp/out blocks. Gate math matches torch exactly: hg = h@U + b_hh
     lands b_hh inside the reset product for the n gate (models/rnn.py has the
     same identity).
  3. grid = (num_batch_tiles,); xp blocks stream in (B_TILE, L, 2*3H) — fwd gates
     then bwd gates (bwd pre-reversed in time) — outputs stream out (B_TILE, L, 2H)
     with torch's bidirectional layout.

Zero h0 only (this engine's deterministic default); the lax.scan path
(models/rnn.py) remains the reference-semantics implementation (randn-h0 replay,
LSTM, training dropout). compute_dtype=jnp.bfloat16 runs MXU-native with f32
accumulation and halves the streamed-block VMEM footprint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recurrence_kernel(xp_ref, whh_ref, bhh_ref, outf_ref, outb_ref,
                       hf_ref, hb_ref, *, H: int, compute_dtype):
    """One (batch_tile, timestep) grid cell.

    The grid is (n_batch_tiles, L) with time innermost; the hidden states live in
    VMEM scratch (hf_ref/hb_ref) persisting across grid steps, so each cell is
    exactly one (B_TILE, H) @ (H, 3H) MXU matmul per direction at full batch tile
    width — Pallas pipelines the next timestep's xp DMA behind it.

    xp_ref: (1, B_TILE, 2*3H) this timestep's x@W_ih+b_ih (fwd | time-reversed bwd);
    outf/outb: (1, B_TILE, H) per-direction outputs (bwd in reversed time,
    un-flipped by the caller).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hb_ref[...] = jnp.zeros_like(hb_ref)

    G = 3 * H
    xg = xp_ref[0]  # stays in storage dtype; gate slices upcast lazily (VMEM stack)

    def cell(xg, h, whh, bhh):
        hg = jnp.dot(h.astype(compute_dtype), whh.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + bhh
        r = jax.nn.sigmoid(xg[:, :H].astype(jnp.float32) + hg[:, :H])
        z = jax.nn.sigmoid(xg[:, H : 2 * H].astype(jnp.float32) + hg[:, H : 2 * H])
        n = jnp.tanh(xg[:, 2 * H :].astype(jnp.float32) + r * hg[:, 2 * H :])
        return (1.0 - z) * n + z * h

    h_f = cell(xg[:, :G], hf_ref[...], whh_ref[0], bhh_ref[0].astype(jnp.float32))
    h_b = cell(xg[:, G:], hb_ref[...], whh_ref[1], bhh_ref[1].astype(jnp.float32))
    hf_ref[...] = h_f
    hb_ref[...] = h_b
    outf_ref[0] = h_f.astype(outf_ref.dtype)
    outb_ref[0] = h_b.astype(outb_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("b_tile", "compute_dtype", "interpret"))
def _recurrence_call(xp, whh, bhh, b_tile, compute_dtype, interpret):
    """xp: (L, B, 2*3H) -> (out_f (L, B, H), out_b (L, B, H) in reversed time)."""
    L, B, G2 = xp.shape
    G = G2 // 2
    H = G // 3
    if B % b_tile != 0:
        pad = b_tile - B % b_tile
        xp = jnp.pad(xp, ((0, 0), (0, pad), (0, 0)))
    Bp = xp.shape[1]
    out_dtype = xp.dtype  # bf16 in the bf16 path halves output stream volume
    kernel = functools.partial(_recurrence_kernel, H=H, compute_dtype=compute_dtype)
    out_f, out_b = pl.pallas_call(
        kernel,
        grid=(Bp // b_tile, L),
        in_specs=[
            pl.BlockSpec((1, b_tile, G2), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, G), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, G), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_tile, H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile, H), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp, H), out_dtype),
            jax.ShapeDtypeStruct((L, Bp, H), out_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        interpret=interpret,
    )(xp, whh, bhh)
    return out_f[:, :B], out_b[:, :B]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _default_tile(compute_dtype) -> int:
    # per-(tile, step) xp block bytes = b_tile * 6H(1536) * itemsize; the budget
    # also covers double buffering, two out blocks, weights, two (b_tile, H) f32
    # state scratches AND the kernel's f32 gate intermediates (hg/r/z/n) — 512
    # is the largest tile that reliably fits 16MB VMEM for H=256
    return 512


def bigru_layer_pallas(layer: dict, x: jnp.ndarray, b_tile: int | None = None,
                       compute_dtype=jnp.float32,
                       interpret: bool | None = None) -> jnp.ndarray:
    """One bidirectional GRU layer, zero h0. x: (B, L, C) -> (B, L, 2H) f32."""
    if interpret is None:
        interpret = not _on_tpu()
    if b_tile is None:
        b_tile = _default_tile(compute_dtype)
    B, L, _C = x.shape
    wih = jnp.stack([jnp.asarray(layer["fwd"]["w_ih"]).T,
                     jnp.asarray(layer["bwd"]["w_ih"]).T])  # (2, C, 3H)
    b_ih = jnp.stack([jnp.asarray(layer["fwd"]["b_ih"]),
                      jnp.asarray(layer["bwd"]["b_ih"])])  # (2, 3H)
    whh = jnp.stack([jnp.asarray(layer["fwd"]["w_hh"]).T,
                     jnp.asarray(layer["bwd"]["w_hh"]).T])  # (2, H, 3H)
    bhh = jnp.stack([jnp.asarray(layer["fwd"]["b_hh"]),
                     jnp.asarray(layer["bwd"]["b_hh"])])  # (2, 3H)
    # hoisted input projection, one big MXU matmul over (B*L) rows per direction;
    # bwd direction consumes time-reversed inputs; layout time-major for the kernel
    x_pair = jnp.stack([x, jnp.flip(x, axis=1)], axis=2)  # (B, L, 2, C)
    xp = jnp.einsum("bldc,dcg->lbdg", x_pair.astype(compute_dtype),
                    wih.astype(compute_dtype),
                    preferred_element_type=jnp.float32) + b_ih[None, None, :, :]
    xp = xp.reshape(L, B, -1)  # (L, B, 2*3H): fwd gates | bwd gates
    if compute_dtype == jnp.bfloat16:
        xp = xp.astype(jnp.bfloat16)
    b_tile = min(b_tile, max(8, B))
    out_f, out_b = _recurrence_call(xp, whh, bhh, b_tile, compute_dtype, interpret)
    # bwd ran on time-reversed inputs: un-flip, then back to batch-major
    out = jnp.concatenate([out_f, jnp.flip(out_b, axis=0)], axis=-1)  # (L, B, 2H)
    return jnp.transpose(out, (1, 0, 2))  # (B, L, 2H)


def birnn_apply_pallas(layers: list[dict], x: jnp.ndarray,
                       compute_dtype=jnp.float32, b_tile: int | None = None,
                       interpret: bool | None = None):
    """Multi-layer BiGRU on the fused kernel; returns (outputs, h_n torch-layout).

    h_n is reconstructed from the outputs (zero-h0 GRU: h_n fwd = out[:, -1, :H],
    h_n bwd = out[:, 0, H:]) so attention's last-layer query needs no extra state.
    """
    out = x
    h_ns = []
    H = jnp.asarray(layers[0]["fwd"]["w_hh"]).shape[0] // 3
    for ld in layers:
        out = bigru_layer_pallas(ld, out, b_tile=b_tile,
                                 compute_dtype=compute_dtype, interpret=interpret)
        h_ns.append(jnp.stack([out[:, -1, :H], out[:, 0, H:]], axis=0)
                    .astype(jnp.float32))
    return out.astype(jnp.float32), jnp.concatenate(h_ns, axis=0)
