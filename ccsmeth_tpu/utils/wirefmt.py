"""Shared host<->device wire-format primitives.

One definition of the quantized byte-row encodings used by BOTH the inference
dispatch rows (parallel/mesh.py) and the training batch rows
(training/train.py --train_transfer packed), so the two paths cannot silently
diverge (advisor r4 finding):

  kmer4 — two 4-bit base codes per byte (codes 0..4, utils/constants
          BYTE2CODE) — EXACT round-trip.
  u16   — one uint16 little-endian scalar per row — EXACT for integer BAM
          tags (npass).
  i8q   — standardized kinetics quantized round(x*QSCALE) clipped to int8:
          ±7.94 range, 1/16 granularity (documented fast-path drift).

Host-side packers are numpy; device-side unpackers are jax (static slices +
bitcasts, exact). tests/test_packed_transfer.py and tests/test_training.py
gate the round-trips; both higher-level row formats import from here.
"""

from __future__ import annotations

import numpy as np

QSCALE = 16.0


# --- host-side (numpy) packers ---------------------------------------------

def pack_kmer4_np(u: np.ndarray) -> np.ndarray:
    """(B, L) base codes 0..15 -> (B, ceil(L/2)) nibble-packed uint8.
    Low nibble = even position, high nibble = odd position."""
    u = u.astype(np.uint8)
    B = u.shape[0]
    if u.shape[1] % 2:
        u = np.concatenate([u, np.zeros((B, 1), np.uint8)], axis=1)
    return u[:, 0::2] | (u[:, 1::2] << 4)


def pack_u16_np(v: np.ndarray) -> np.ndarray:
    """(B,) scalars -> (B, 2) little-endian uint16 bytes (round + clip)."""
    s = np.clip(np.rint(np.asarray(v, np.float64)), 0, 65535).astype("<u2")
    return s[:, None].view(np.uint8)


def quant_i8_np(v: np.ndarray) -> np.ndarray:
    """fp32 standardized kinetics -> int8 round(x*QSCALE), clipped."""
    return np.clip(np.rint(np.asarray(v, np.float32) * QSCALE),
                   -128, 127).astype(np.int8)


# --- device-side (jax) unpackers --------------------------------------------

def unpack_kmer4_jx(raw, L: int):
    """(B, nb) packed uint8 -> (B, L) uint8 base codes (jnp)."""
    import jax.numpy as jnp

    B, nb = raw.shape
    return jnp.stack([raw & 0xF, raw >> 4], axis=-1).reshape(B, 2 * nb)[:, :L]


def unpack_u16_jx(raw):
    """(B, 2) uint8 -> (B, 1) uint16 (jnp bitcast)."""
    import jax
    import jax.numpy as jnp

    B = raw.shape[0]
    return jax.lax.bitcast_convert_type(raw.reshape(B, 1, 2), jnp.uint16)


def dequant_i8_jx(q):
    """int8 quantized kinetics -> fp32 (jnp)."""
    import jax.numpy as jnp

    return q.astype(jnp.float32) * (1.0 / QSCALE)
