"""Bidirectional multi-layer GRU/LSTM as pure JAX functions.

TPU-first design (not a torch translation):

- The per-timestep input projection ``x @ W_ih^T`` for ALL timesteps is hoisted out of
  the recurrence into one large MXU matmul (B*L, C) @ (C, 3H); the ``lax.scan`` then
  only carries the (B, H) @ (H, 3H) recurrent matmul per step.
- Both directions run in ONE scan: the reverse direction's inputs are time-flipped and
  stacked on the batch axis, so a 3-layer BiGRU is exactly 3 scans of 21 steps each
  regardless of direction count.
- An optional fused Pallas kernel (ops/bigru_pallas.py) implements the same math with
  weights resident in VMEM.

Gate math matches torch.nn.GRU/LSTM (gate order r,z,n / i,f,g,o; note GRU's b_hn sits
inside the reset gate product), so converted reference checkpoints
(/root/reference/ccsmeth/models.py:48-57) reproduce bitwise-comparable fp32 outputs.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def init_rnn_params(rng: np.random.RandomState, input_size: int, hidden_size: int,
                    num_layers: int, cell: str = "gru") -> list[dict]:
    """torch-default init: uniform(-1/sqrt(H), 1/sqrt(H)) for every tensor."""
    gates = 3 if cell == "gru" else 4
    k = 1.0 / math.sqrt(hidden_size)
    layers = []
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else hidden_size * 2
        ld = {}
        for d in ("fwd", "bwd"):
            ld[d] = {
                "w_ih": rng.uniform(-k, k, (gates * hidden_size, in_sz)).astype(np.float32),
                "w_hh": rng.uniform(-k, k, (gates * hidden_size, hidden_size)).astype(np.float32),
                "b_ih": rng.uniform(-k, k, (gates * hidden_size,)).astype(np.float32),
                "b_hh": rng.uniform(-k, k, (gates * hidden_size,)).astype(np.float32),
            }
        layers.append(ld)
    return layers


def birnn_apply(layers: list[dict], x: jnp.ndarray, h0: jnp.ndarray,
                c0: jnp.ndarray | None = None, cell: str = "gru",
                dropout_rate: float = 0.0, dropout_rng=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-layer bidirectional RNN.

    x: (B, L, C). h0 (and c0 for lstm): (num_layers*2, B, H) in torch order
    [l0_fwd, l0_bwd, l1_fwd, l1_bwd, ...]. Returns (outputs (B, L, 2H), h_n with
    torch layout (num_layers*2, B, H)).

    Inter-layer dropout (on every layer's output but the last) matches torch.nn.GRU
    (reference models.py:50-55 passes dropout=dropout_rate); active only when
    dropout_rng is provided.
    """
    B, L, _ = x.shape
    H = h0.shape[-1]
    num_layers = len(layers)
    out = x
    h_ns = []
    c_ns = []
    for li, ld in enumerate(layers):
        # stack directions on batch: fwd gets out, bwd gets time-flipped out
        rev_in = jnp.flip(out, axis=1)
        both_in = jnp.concatenate([out, rev_in], axis=0)  # (2B, L, C)
        w_ih = jnp.concatenate([ld["fwd"]["w_ih"][None], ld["bwd"]["w_ih"][None]], axis=0)
        b_ih = jnp.stack([ld["fwd"]["b_ih"], ld["bwd"]["b_ih"]], axis=0)
        # x-projection as one big matmul: (2B*L, C) @ (C, 3H) per direction
        xp = jnp.einsum("dblc,dgc->dblg",
                        both_in.reshape(2, B, L, -1), w_ih,
                        preferred_element_type=jnp.float32) + b_ih[:, None, None, :]
        b_hh = jnp.stack([ld["fwd"]["b_hh"], ld["bwd"]["b_hh"]], axis=0)
        # directions have separate weights: fold direction into the recurrent gate
        # matmul via a batched einsum over (2, H, G) weights. The scan carry keeps
        # BATCH in dim 0 ((B, 2, H), not (2, B, H)) so SPMD shards the data axis
        # cleanly under pjit (dim-0 sharding is what the mesh propagates).
        xp2 = xp.transpose(2, 1, 0, 3)  # (L, B, 2, G)
        h0_l = jnp.stack([h0[2 * li], h0[2 * li + 1]], axis=1)  # (B, 2, H)
        if cell == "gru":
            w_hh_t = jnp.stack([ld["fwd"]["w_hh"].T, ld["bwd"]["w_hh"].T], axis=0)  # (2,H,3H)

            def step(h, xp_t):
                hp = jnp.einsum("bdh,dhg->bdg", h, w_hh_t,
                                preferred_element_type=jnp.float32) + b_hh[None, :, :]
                g = xp_t
                r = jax.nn.sigmoid(g[..., :H] + hp[..., :H])
                z = jax.nn.sigmoid(g[..., H : 2 * H] + hp[..., H : 2 * H])
                n = jnp.tanh(g[..., 2 * H :] + r * hp[..., 2 * H :])
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h_n, ys = jax.lax.scan(step, h0_l, xp2)  # ys: (L, B, 2, H)
            h_ns.append(jnp.moveaxis(h_n, 1, 0))
        else:
            w_hh_t = jnp.stack([ld["fwd"]["w_hh"].T, ld["bwd"]["w_hh"].T], axis=0)
            c0_l = jnp.stack([c0[2 * li], c0[2 * li + 1]], axis=1)

            def step(carry, xp_t):
                h, c = carry
                g = xp_t + jnp.einsum("bdh,dhg->bdg", h, w_hh_t,
                                      preferred_element_type=jnp.float32) + b_hh[None, :, :]
                i = jax.nn.sigmoid(g[..., :H])
                f = jax.nn.sigmoid(g[..., H : 2 * H])
                gg = jnp.tanh(g[..., 2 * H : 3 * H])
                o = jax.nn.sigmoid(g[..., 3 * H :])
                c_new = f * c + i * gg
                h_new = o * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            (h_n, c_n), ys = jax.lax.scan(step, (h0_l, c0_l), xp2)
            h_ns.append(jnp.moveaxis(h_n, 1, 0))
            c_ns.append(jnp.moveaxis(c_n, 1, 0))
        fwd_out = ys[:, :, 0].transpose(1, 0, 2)  # (B, L, H)
        bwd_out = jnp.flip(ys[:, :, 1].transpose(1, 0, 2), axis=1)  # un-flip time
        out = jnp.concatenate([fwd_out, bwd_out], axis=-1)  # (B, L, 2H)
        if dropout_rate > 0.0 and dropout_rng is not None and li < num_layers - 1:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    h_n_all = jnp.concatenate(h_ns, axis=0)  # (num_layers*2, B, H) torch order
    return out, h_n_all
