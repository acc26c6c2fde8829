"""Bahdanau additive attention as a pure function.

Math parity with the reference Attention module
(/root/reference/ccsmeth/utils/attention.py:30-70):
  score  = va . tanh(Wa q + Ua K)        (N, L, 1)
  weights= softmax over L                (N, L)
  context= K^T @ weights                 (N, 2H)

Params are stored input-major: Wa (q_size, hidden), Ua (k_size, hidden), va (hidden, 1)
— i.e. the transpose of torch's nn.Linear weight layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init_attention(rng: np.random.RandomState, query_size: int, key_size: int,
                   hidden_size: int) -> dict:
    """torch nn.Linear default init (kaiming_uniform a=sqrt(5) == U(-1/sqrt(fan_in), ...))."""

    def lin(fan_in, fan_out):
        k = 1.0 / math.sqrt(fan_in)
        return rng.uniform(-k, k, (fan_in, fan_out)).astype(np.float32)

    return {
        "Wa": lin(query_size, hidden_size),
        "Ua": lin(key_size, hidden_size),
        "va": lin(hidden_size, 1),
    }


def apply_attention(params: dict, query: jnp.ndarray, keys: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """query: (N, 1, Q); keys: (N, L, K). Returns (context (N, K), weights (N, L))."""
    e = jnp.tanh(
        jnp.dot(query, params["Wa"], preferred_element_type=jnp.float32)
        + jnp.dot(keys, params["Ua"], preferred_element_type=jnp.float32)
    )  # (N, L, hidden)
    scores = jnp.dot(e, params["va"], preferred_element_type=jnp.float32)[..., 0]  # (N, L)
    weights = jax.nn.softmax(scores, axis=1)
    context = jnp.einsum("nlk,nl->nk", keys, weights, preferred_element_type=jnp.float32)
    return context, weights
