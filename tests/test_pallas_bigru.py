"""Fused Pallas BiGRU kernel vs the lax.scan reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ccsmeth_tpu.models import AttRNNConfig, init_attrnn, apply_attrnn
from ccsmeth_tpu.models.rnn import birnn_apply, init_rnn_params
from ccsmeth_tpu.ops.bigru_pallas import (bigru_layer_pallas, birnn_apply_pallas,
                                          birnn_apply_pallas_stacked)


def test_single_layer_matches_scan():
    rng = np.random.RandomState(0)
    B, L, C, H = 16, 21, 11, 32
    layers = init_rnn_params(rng, C, H, 1, "gru")
    x = rng.randn(B, L, C).astype(np.float32)
    h0 = jnp.zeros((2, B, H), jnp.float32)
    ref_out, _ = birnn_apply(layers, jnp.asarray(x), h0, None, "gru")
    pall_out = bigru_layer_pallas(layers[0], jnp.asarray(x), b_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(pall_out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-5)


def test_multilayer_and_hn():
    rng = np.random.RandomState(1)
    B, L, C, H, NL = 8, 21, 11, 16, 3
    layers = init_rnn_params(rng, C, H, NL, "gru")
    x = rng.randn(B, L, C).astype(np.float32)
    h0 = jnp.zeros((NL * 2, B, H), jnp.float32)
    ref_out, ref_hn = birnn_apply(layers, jnp.asarray(x), h0, None, "gru")
    pall_out, pall_hn = birnn_apply_pallas(layers, jnp.asarray(x), interpret=True,
                                           b_tile=8)
    np.testing.assert_allclose(np.asarray(pall_out), np.asarray(ref_out), atol=3e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pall_hn), np.asarray(ref_hn), atol=3e-5,
                               rtol=1e-5)


def test_batch_tile_padding():
    """Batch not divisible by tile: padded rows must not leak into real rows."""
    rng = np.random.RandomState(2)
    B, L, C, H = 13, 21, 11, 16
    layers = init_rnn_params(rng, C, H, 1, "gru")
    x = rng.randn(B, L, C).astype(np.float32)
    h0 = jnp.zeros((2, B, H), jnp.float32)
    ref_out, _ = birnn_apply(layers, jnp.asarray(x), h0, None, "gru")
    pall_out = bigru_layer_pallas(layers[0], jnp.asarray(x), b_tile=8, interpret=True)
    assert pall_out.shape == (B, L, 2 * H)
    np.testing.assert_allclose(np.asarray(pall_out), np.asarray(ref_out), atol=2e-5,
                               rtol=1e-5)


def test_full_model_pallas_backend_matches_xla():
    cfg = AttRNNConfig(num_layers=2, hidden_size=32, dropout_rate=0)
    params = init_attrnn(3, cfg)
    rng = np.random.RandomState(4)
    B, L = 12, 21
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.full((B, L), 5.0, np.float32)
        feats["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["pw_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["ipd_stds" + s] = np.zeros((B, L), np.float32)
        feats["pw_stds" + s] = np.zeros((B, L), np.float32)
        feats["sns" + s] = np.zeros((B, 4), np.float32)
        feats["maps" + s] = np.zeros((B, L), np.float32)
    l_x, p_x = apply_attrnn(params, cfg, feats)
    l_p, p_p = apply_attrnn(params, cfg, feats, rnn_backend="pallas")
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_x), atol=5e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_stacked_whole_network_matches_scan(cell):
    """One-pallas_call whole-network kernel vs the lax.scan path, incl. odd B."""
    rng = np.random.RandomState(9)
    B, L, C, H, NL = 13, 21, 11, 16, 3
    layers = init_rnn_params(rng, C, H, NL, cell)
    x = rng.randn(B, L, C).astype(np.float32)
    h0 = jnp.zeros((NL * 2, B, H), jnp.float32)
    c0 = h0 if cell == "lstm" else None
    ref_out, ref_hn = birnn_apply(layers, jnp.asarray(x), h0, c0, cell)
    out, hn = birnn_apply_pallas_stacked(layers, jnp.asarray(x), interpret=True,
                                         b_tile=8, cell=cell)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=3e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(ref_hn), atol=3e-5,
                               rtol=1e-5)
    # the direction-batched chain (one batched dot per timestep instead of two
    # interleaved ones) is the same math bit for bit
    out_db, hn_db = birnn_apply_pallas_stacked(
        layers, jnp.asarray(x), interpret=True, b_tile=8, cell=cell,
        dir_batched=True)
    np.testing.assert_array_equal(np.asarray(out_db), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(hn_db), np.asarray(hn))
    # the multi-chain variant (batch tile split into n_chains interleaved
    # recurrences) is the same math bit for bit: the recurrence never mixes
    # batch rows, so sub-tiling the batch only reorders independent ops
    out_mc, hn_mc = birnn_apply_pallas_stacked(
        layers, jnp.asarray(x), interpret=True, b_tile=8, cell=cell,
        n_chains=2)
    np.testing.assert_array_equal(np.asarray(out_mc), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(hn_mc), np.asarray(hn))


def test_lstm_multilayer_matches_scan():
    rng = np.random.RandomState(5)
    B, L, C, H, NL = 8, 21, 11, 16, 2
    layers = init_rnn_params(rng, C, H, NL, "lstm")
    x = rng.randn(B, L, C).astype(np.float32)
    h0 = jnp.zeros((NL * 2, B, H), jnp.float32)
    c0 = jnp.zeros((NL * 2, B, H), jnp.float32)
    ref_out, ref_hn = birnn_apply(layers, jnp.asarray(x), h0, c0, "lstm")
    pall_out, pall_hn = birnn_apply_pallas(layers, jnp.asarray(x), interpret=True,
                                           b_tile=8, cell="lstm")
    np.testing.assert_allclose(np.asarray(pall_out), np.asarray(ref_out), atol=3e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pall_hn), np.asarray(ref_hn), atol=3e-5,
                               rtol=1e-5)


def _lstm_feats(rng, B=12, L=21):
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.full((B, L), 5.0, np.float32)
        feats["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["pw_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["ipd_stds" + s] = np.zeros((B, L), np.float32)
        feats["pw_stds" + s] = np.zeros((B, L), np.float32)
        feats["sns" + s] = np.zeros((B, 4), np.float32)
        feats["maps" + s] = np.zeros((B, L), np.float32)
    return feats


def test_full_lstm_model_pallas_backend_matches_xla():
    cfg = AttRNNConfig(num_layers=2, hidden_size=32, dropout_rate=0,
                       model_type="attbilstm2s")
    params = init_attrnn(6, cfg)
    rng = np.random.RandomState(7)
    feats = _lstm_feats(rng)
    l_x, p_x = apply_attrnn(params, cfg, feats)
    l_p, p_p = apply_attrnn(params, cfg, feats, rnn_backend="pallas")
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_x), atol=5e-6)


def test_pallas_backend_rejects_nonzero_h0():
    cfg = AttRNNConfig(num_layers=1, hidden_size=16, dropout_rate=0,
                       model_type="attbilstm2s")
    params = init_attrnn(0, cfg)
    rng = np.random.RandomState(8)
    feats = _lstm_feats(rng, B=2)
    h0 = jnp.zeros((2, 2, 16), jnp.float32)
    with pytest.raises(ValueError):
        apply_attrnn(params, cfg, feats, rnn_backend="pallas", h0=h0)


def test_pallas_backend_lstm_train_grads_finite():
    """Full-model train forward+grad through the LSTM custom-VJP path."""
    cfg = AttRNNConfig(num_layers=2, hidden_size=16, dropout_rate=0.2,
                       model_type="attbilstm2s")
    params = init_attrnn(1, cfg)
    rng = np.random.RandomState(9)
    feats = _lstm_feats(rng, B=8)

    def loss(p):
        logits, _ = apply_attrnn(p, cfg, feats, rnn_backend="pallas",
                                 train=True, dropout_rng=jax.random.PRNGKey(0))
        return jnp.sum(logits ** 2)

    import jax
    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # the rnn weights must actually receive gradient
    gl0 = g["rnn"][0]["fwd"]["w_ih"]
    assert float(jnp.abs(gl0).max()) > 0
