"""Fused whole-encoder transenc kernel vs the XLA path (interpret mode on CPU).

The block-diagonal sample-packed attention (ops/transenc_pallas.py) must be
exactly the per-sample attention: the -1e9 additive mask underflows off-block
softmax terms to 0 after row-max subtraction. On-device numerics are gated by
bench.py's numerics mode on the real chip."""

import jax.numpy as jnp
import numpy as np
import pytest

from ccsmeth_tpu.models.config import TransEncConfig
from ccsmeth_tpu.models.transenc import (_encoder, _strand_embed,
                                         apply_transenc, init_transenc)
from ccsmeth_tpu.ops.transenc_pallas import encoder_pooled_pallas


from tests.synth import example_feats as _feats


def test_encoder_kernel_matches_xla():
    cfg = TransEncConfig(dropout_rate=0.0)
    params = init_transenc(11, cfg)
    B = 48  # exactly one tile (8 packs x 6 samples)
    x = np.random.RandomState(3).randn(B, cfg.seq_len, cfg.d_model).astype(
        np.float32) * 0.4
    ref = np.asarray(jnp.mean(_encoder(params, cfg, jnp.asarray(x), None,
                                       False), axis=1))
    got = np.asarray(encoder_pooled_pallas(params, cfg, jnp.asarray(x),
                                           interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("attn_impl,pack,npacks", [
    ("stackhead", 6, 8), ("wsplit", 6, 8), ("packed", 12, 4),
    ("stackhead", 12, 4), ("headrows", 6, 8),
    ("wqk", 12, 4), ("wqk", 6, 8),
    ("packed16", 12, 4), ("packed16", 6, 8)])
def test_encoder_attn_formulations_match_xla(attn_impl, pack, npacks):
    """Every attention formulation/pack-size of the fused kernel is the same
    math as the XLA encoder (formulations differ only in MXU layout)."""
    cfg = TransEncConfig(dropout_rate=0.0)
    params = init_transenc(11, cfg)
    B = pack * npacks
    x = np.random.RandomState(3).randn(B, cfg.seq_len, cfg.d_model).astype(
        np.float32) * 0.4
    ref = np.asarray(jnp.mean(_encoder(params, cfg, jnp.asarray(x), None,
                                       False), axis=1))
    got = np.asarray(encoder_pooled_pallas(
        params, cfg, jnp.asarray(x), interpret=True, attn_impl=attn_impl,
        pack=pack, npacks=npacks))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_padding_batch_not_multiple_of_tile():
    cfg = TransEncConfig(dropout_rate=0.0, num_layers=2)
    params = init_transenc(5, cfg)
    B = 50  # pads to 96; pad samples must not leak into real ones
    x = np.random.RandomState(4).randn(B, cfg.seq_len, cfg.d_model).astype(
        np.float32) * 0.4
    ref = np.asarray(jnp.mean(_encoder(params, cfg, jnp.asarray(x), None,
                                       False), axis=1))
    got = np.asarray(encoder_pooled_pallas(params, cfg, jnp.asarray(x),
                                           interpret=True))
    assert got.shape == (B, cfg.d_model)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_full_model_surface_parity():
    """apply_transenc(backend='pallas') == backend='xla' at the probs surface,
    drift far below one ML byte (1/256)."""
    cfg = TransEncConfig(dropout_rate=0.0)
    params = init_transenc(7, cfg)
    feats = _feats(52)
    ref = np.asarray(apply_transenc(params, cfg, feats)[1])
    got = np.asarray(apply_transenc(params, cfg, feats, backend="pallas")[1])
    assert float(np.max(np.abs(got - ref))) < 1e-5


def test_train_path_ignores_pallas_backend():
    """Training must keep using the XLA encoder (dropout lives there)."""
    import jax

    cfg = TransEncConfig(dropout_rate=0.5)
    params = init_transenc(9, cfg)
    feats = _feats(12)
    rng = jax.random.PRNGKey(0)
    logits, _ = apply_transenc(params, cfg, feats, dropout_rng=rng, train=True,
                               backend="pallas")
    assert np.isfinite(np.asarray(logits)).all()
