"""call_mods --h0_mode randn: runtime replay of the reference's per-forward
randn initial states (VERDICT r1 missing #2).

The reference seeds torch once (call_modifications.py:479-481) and draws h0
[+ c0 for lstm] per strand inside every forward (models.py:77-87, 126-131);
a published-ckpt eval is only bit-reproducible if that RNG stream is replayed.
These tests gate the engine's replay against the reference model itself run
over the SAME multi-batch stream (full batches then a partial one, like a real
run's tail), through the production make_predict_fn/_compact plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from ccsmeth_tpu.models import AttRNNConfig
from ccsmeth_tpu.parallel.mesh import make_predict_fn
from ccsmeth_tpu.pipeline.call_mods import (CallModsConfig, _apply_for,
                                            _h0_stream_for, _make_h0_stream)

from tests.refmodels import import_reference_models
from tests.test_model_parity import _attrnn_from_sd, _np_sd, _rand_feats


def test_h0_stream_matches_reference_rng():
    """Draw order + values: seed once, then strand1-h0 [c0] strand2-h0 [c0]
    per forward, across several forwards with varying batch sizes."""
    NL, H = 2, 16
    for cell, keys in (("gru", ["h0", "h0_2"]),
                       ("lstm", ["h0", "c0", "h0_2", "c0_2"])):
        cfg = AttRNNConfig(num_layers=NL, hidden_size=H,
                           model_type="attbigru2s" if cell == "gru"
                           else "attbilstm2s")
        plan = ((8, 8), (8, 8), (3, 8))
        stream = _make_h0_stream(cfg, tseed=77)  # seeds the global torch RNG
        engine = [stream(n_valid, pad_n) for n_valid, pad_n in plan]
        torch.manual_seed(77)  # replay the expected stream afresh
        for got, (n_valid, pad_n) in zip(engine, plan):
            assert list(got) == keys
            for k in keys:
                want = torch.randn(NL * 2, n_valid, H).numpy()
                np.testing.assert_array_equal(got[k][:, :n_valid], want)
                # pad rows must be zero (masked out on the host)
                assert not got[k][:, n_valid:].any()


@pytest.mark.parametrize("model_type", ["attbigru2s", "attbilstm2s"])
def test_randn_h0_stream_parity_vs_reference(model_type):
    """Engine predict path with h0_mode=randn == reference model over the same
    batch stream (2 full batches + 1 partial), same tseed."""
    ref_models = import_reference_models()
    B, L, H, NL, seed = 8, 21, 32, 2, 4321
    cfg = AttRNNConfig(seq_len=L, num_layers=NL, hidden_size=H,
                       dropout_rate=0, model_type=model_type)
    torch.manual_seed(5)
    tm = ref_models.ModelAttRNN(L, NL, 2, 0, H, model_type=model_type)
    tm.eval()
    params = _attrnn_from_sd(_np_sd(tm), cfg)

    rng = np.random.RandomState(0)
    batches = [_rand_feats(rng, B, L), _rand_feats(rng, B, L),
               _rand_feats(rng, 3, L)]  # partial tail

    # --- reference: seed once, forward each batch (its own h0 draws) ---
    torch.manual_seed(seed)
    t = lambda x: torch.tensor(x, dtype=torch.float)
    ref_probs = []
    with torch.no_grad():
        for f in batches:
            _lg, pb = tm(
                t(f["kmer"]), t(f["kpass"]), t(f["ipd_means"]), t(f["ipd_stds"]),
                t(f["pw_means"]), t(f["pw_stds"]), t(f["sns"]), t(f["maps"]),
                t(f["kmer2"]), t(f["kpass2"]), t(f["ipd_means2"]),
                t(f["ipd_stds2"]), t(f["pw_means2"]), t(f["pw_stds2"]),
                t(f["sns2"]), t(f["maps2"]))
            ref_probs.append(pb.numpy())

    # --- engine: same stream through the production plumbing ---
    mcfg = CallModsConfig(model_type=model_type, seq_len=L, layer_rnn=NL,
                          hid_rnn=H, h0_mode="randn", tseed=seed)
    model_cfg = mcfg.model_config()
    assert model_cfg.rnn_cell == ("lstm" if "lstm" in model_type else "gru")
    predict = make_predict_fn(_apply_for(model_cfg, "xla", "fp32"), params,
                              model_cfg)
    h0_draw = _h0_stream_for(mcfg, model_cfg)
    pad_n = 8
    for f, want in zip(batches, ref_probs):
        n_valid = f["kmer"].shape[0]
        if n_valid < pad_n:  # pad the tail batch like the pipeline does
            f = {k: np.pad(v, [(0, pad_n - n_valid)] + [(0, 0)] *
                           (v.ndim - 1)) for k, v in f.items()}
        f.update(h0_draw(n_valid, pad_n))
        got = predict(f)[:n_valid]
        np.testing.assert_allclose(got, want, atol=3e-5)


def test_h0_mode_randn_rejects_pallas_and_transenc():
    mcfg = CallModsConfig(h0_mode="randn", rnn_backend="pallas")
    with pytest.raises(ValueError, match="rnn_backend xla"):
        _h0_stream_for(mcfg, mcfg.model_config())
    mcfg = CallModsConfig(h0_mode="randn", model_type="transencoder2s")
    with pytest.raises(ValueError, match="RNN models"):
        _h0_stream_for(mcfg, mcfg.model_config())


def test_h0_mode_zeros_returns_none():
    mcfg = CallModsConfig()
    assert _h0_stream_for(mcfg, mcfg.model_config()) is None
