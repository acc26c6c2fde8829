"""Custom-VJP fused BiGRU: forward and gradients must match jax.grad through the
lax.scan reference path (fp32, interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ccsmeth_tpu.models.rnn import birnn_apply, init_rnn_params
from ccsmeth_tpu.ops.bigru_pallas_vjp import (
    birnn_apply_pallas_trainable,
    fused_bigru_layer_tm,
)
from ccsmeth_tpu.ops.bigru_pallas import _layer_weights


def _loss_scan(layers, x, w):
    h0 = jnp.zeros((len(layers) * 2, x.shape[0], w), jnp.float32)
    out, _ = birnn_apply(layers, x, h0, None, "gru")
    return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))


def _loss_pallas(layers, x, w):
    out, _ = birnn_apply_pallas_trainable(layers, x, b_tile=8, interpret=True)
    return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))


def test_forward_matches_scan():
    rng = np.random.RandomState(0)
    B, L, C, H = 6, 21, 11, 16
    layers = init_rnn_params(rng, C, H, 2, "gru")
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    h0 = jnp.zeros((4, B, H), jnp.float32)
    ref_out, _ = birnn_apply(layers, x, h0, None, "gru")
    out, _ = birnn_apply_pallas_trainable(layers, x, b_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=3e-5,
                               rtol=1e-5)


def test_gradients_match_scan_single_layer():
    rng = np.random.RandomState(1)
    B, L, C, H = 5, 9, 7, 8
    layers = init_rnn_params(rng, C, H, 1, "gru")
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))

    g_ref = jax.grad(lambda x_, ls: _loss_scan(ls, x_, H), argnums=(0, 1))(
        x, layers)
    g_pal = jax.grad(lambda x_, ls: _loss_pallas(ls, x_, H), argnums=(0, 1))(
        x, layers)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               atol=1e-4, rtol=1e-3)
    ref_flat = jax.tree_util.tree_leaves(g_ref[1])
    pal_flat = jax.tree_util.tree_leaves(g_pal[1])
    for a, b in zip(pal_flat, ref_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


def test_gradients_match_scan_multilayer():
    rng = np.random.RandomState(2)
    B, L, C, H = 4, 11, 6, 8
    layers = init_rnn_params(rng, C, H, 2, "gru")
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    g_ref = jax.grad(lambda ls: _loss_scan(ls, x, H))(layers)
    g_pal = jax.grad(lambda ls: _loss_pallas(ls, x, H))(layers)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=2e-3)


def test_batch_padding_gradients():
    """Batch not divisible by tile: padded rows must contribute zero gradient."""
    rng = np.random.RandomState(3)
    B, L, C, H = 5, 7, 4, 8
    layers = init_rnn_params(rng, C, H, 1, "gru")
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    g_ref = jax.grad(lambda ls: _loss_scan(ls, x, H))(layers)
    g_pal = jax.grad(lambda ls: _loss_pallas(ls, x, H))(layers)  # b_tile=8 > B=5
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


def _loss_scan_lstm(layers, x, w):
    h0 = jnp.zeros((len(layers) * 2, x.shape[0], w), jnp.float32)
    out, _ = birnn_apply(layers, x, h0, h0, "lstm")
    return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))


def _loss_pallas_lstm(layers, x, w):
    out, _ = birnn_apply_pallas_trainable(layers, x, b_tile=8, interpret=True,
                                          cell="lstm")
    return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))


def test_lstm_forward_matches_scan():
    rng = np.random.RandomState(4)
    B, L, C, H = 6, 21, 11, 16
    layers = init_rnn_params(rng, C, H, 2, "lstm")
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    h0 = jnp.zeros((4, B, H), jnp.float32)
    ref_out, _ = birnn_apply(layers, x, h0, h0, "lstm")
    out, _ = birnn_apply_pallas_trainable(layers, x, b_tile=8, interpret=True,
                                          cell="lstm")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=3e-5,
                               rtol=1e-5)


def test_lstm_gradients_match_scan_multilayer():
    rng = np.random.RandomState(5)
    B, L, C, H = 5, 11, 7, 8
    layers = init_rnn_params(rng, C, H, 2, "lstm")
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    g_ref = jax.grad(lambda x_, ls: _loss_scan_lstm(ls, x_, H), argnums=(0, 1))(
        x, layers)
    g_pal = jax.grad(lambda x_, ls: _loss_pallas_lstm(ls, x_, H), argnums=(0, 1))(
        x, layers)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal[1]),
                    jax.tree_util.tree_leaves(g_ref[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)
