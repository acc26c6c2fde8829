"""Model-parity gates: JAX forwards vs the reference torch models at fp32.

The randn-h0 eval quirk (reference models.py:77-87) is handled by replaying torch's
RNG: capture the h0 tensors torch would draw, pass them explicitly to the JAX apply,
then reseed torch so its forward draws the same ones.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ccsmeth_tpu.models import (
    AggrConfig,
    AttRNNConfig,
    TransEncConfig,
    apply_aggr_attrnn,
    apply_attrnn,
    torch_ckpt_to_params,
)
from ccsmeth_tpu.models.convert import _aggr_from_sd, _attrnn_from_sd, _transenc_from_sd
from ccsmeth_tpu.models.transenc import apply_transenc

from tests.refmodels import import_reference_models, torch_h0

AGGRE_CKPT = "/root/reference/models/model_ccsmeth_5mCpG_aggregate_attbigru_b11.v2p.ckpt"


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _rand_feats(rng, B, L, embedded=False, two=True):
    f = {}
    suffixes = ["", "2"] if two else [""]
    for s in suffixes:
        f["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        f["kpass" + s] = np.full((B, L), float(rng.randint(1, 28)), np.float32)
        if embedded:
            f["ipd_means" + s] = rng.randint(0, 953, (B, L)).astype(np.float32)
            f["pw_means" + s] = rng.randint(0, 953, (B, L)).astype(np.float32)
        else:
            f["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
            f["pw_means" + s] = rng.randn(B, L).astype(np.float32)
        f["ipd_stds" + s] = np.zeros((B, L), np.float32)
        f["pw_stds" + s] = np.zeros((B, L), np.float32)
        f["sns" + s] = np.zeros((B, 4), np.float32)
        f["maps" + s] = np.zeros((B, L), np.float32)
    return f


def _torch_forward_2s(model, f, seed):
    t = lambda x: torch.tensor(x, dtype=torch.float)
    torch.manual_seed(seed)  # forward draws h0 via randn per strand
    with torch.no_grad():
        logits, probs = model(
            t(f["kmer"]), t(f["kpass"]), t(f["ipd_means"]), t(f["ipd_stds"]),
            t(f["pw_means"]), t(f["pw_stds"]), t(f["sns"]), t(f["maps"]),
            t(f["kmer2"]), t(f["kpass2"]), t(f["ipd_means2"]), t(f["ipd_stds2"]),
            t(f["pw_means2"]), t(f["pw_stds2"]), t(f["sns2"]), t(f["maps2"]),
        )
    return logits.numpy(), probs.numpy()


@pytest.mark.parametrize("model_type", ["attbigru2s", "attbilstm2s"])
def test_attrnn_2s_parity(model_type):
    ref_models = import_reference_models()
    B, L, H, NL = 6, 21, 256, 3
    cfg = AttRNNConfig(seq_len=L, num_layers=NL, hidden_size=H, dropout_rate=0,
                       model_type=model_type)
    torch.manual_seed(11)
    tm = ref_models.ModelAttRNN(L, NL, 2, 0, H, model_type=model_type)
    tm.eval()
    params = _attrnn_from_sd(_np_sd(tm), cfg)
    rng = np.random.RandomState(0)
    f = _rand_feats(rng, B, L)

    seed = 1234
    if cfg.rnn_cell == "lstm":
        draws = torch_h0(seed, NL, B, H, 4)  # h0_1, c0_1, h0_2, c0_2
        h0_1, c0_1, h0_2, c0_2 = [d.numpy() for d in draws]
        logits_j, probs_j = apply_attrnn(params, cfg, f, h0=h0_1, h0_2=h0_2,
                                         c0=c0_1, c0_2=c0_2)
    else:
        draws = torch_h0(seed, NL, B, H, 2)
        h0_1, h0_2 = [d.numpy() for d in draws]
        logits_j, probs_j = apply_attrnn(params, cfg, f, h0=h0_1, h0_2=h0_2)
    logits_t, probs_t = _torch_forward_2s(tm, f, seed)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(probs_j), probs_t, atol=2e-5)


def test_attrnn2_embedded_parity():
    ref_models = import_reference_models()
    B, L, H, NL = 4, 21, 64, 2
    cfg = AttRNNConfig(seq_len=L, num_layers=NL, hidden_size=H, dropout_rate=0,
                       model_type="attbigru2s2")
    torch.manual_seed(5)
    tm = ref_models.ModelAttRNN2(L, NL, 2, 0, H, model_type="attbigru2s2")
    tm.eval()
    params = _attrnn_from_sd(_np_sd(tm), cfg)
    rng = np.random.RandomState(1)
    f = _rand_feats(rng, B, L, embedded=True)
    seed = 99
    h0_1, h0_2 = [d.numpy() for d in torch_h0(seed, NL, B, H, 2)]
    logits_j, probs_j = apply_attrnn(params, cfg, f, h0=h0_1, h0_2=h0_2)
    logits_t, probs_t = _torch_forward_2s(tm, f, seed)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(probs_j), probs_t, atol=2e-5)


def test_aggr_parity_with_shipped_ckpt():
    """The only weight file present in the snapshot: aggregate attbigru_b11.v2p."""
    if not os.path.exists(AGGRE_CKPT):
        pytest.skip("aggregate ckpt not present")
    ref_models = import_reference_models()
    cfg = AggrConfig()
    B, L = 8, 11
    tm = ref_models.AggrAttRNN(cfg.seq_len, cfg.num_layers, cfg.num_classes, 0,
                               cfg.hidden_size, binsize=cfg.binsize,
                               model_type="attbigru", device="cpu")
    sd = torch.load(AGGRE_CKPT, map_location="cpu", weights_only=True)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    tm.load_state_dict(sd)
    tm.eval()
    params = torch_ckpt_to_params(AGGRE_CKPT, cfg)

    rng = np.random.RandomState(3)
    # realistic inputs: L2-normalized 20-bin histograms + |Δpos| offsets
    histos = rng.rand(B, L, 20).astype(np.float32)
    histos /= np.linalg.norm(histos, axis=2, keepdims=True)
    offsets = np.abs(rng.randint(-500, 500, (B, L))).astype(np.float32)

    seed = 1234
    (h0,) = torch_h0(seed, cfg.num_layers, B, cfg.hidden_size, 1)
    out_j = apply_aggr_attrnn(params, cfg, offsets, histos, h0=h0.numpy())
    torch.manual_seed(seed)
    with torch.no_grad():
        out_t = tm(torch.tensor(offsets), torch.tensor(histos)).numpy()
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5, rtol=1e-5)


def test_transenc_parity():
    ref_models = import_reference_models()
    B, L = 3, 21
    cfg = TransEncConfig(seq_len=L, num_layers=2, d_model=64, nhead=4, dim_ff=128,
                         dropout_rate=0)
    torch.manual_seed(21)
    tm = ref_models.ModelTransEnc(L, cfg.num_layers, 2, 0, cfg.d_model, cfg.nhead,
                                  cfg.dim_ff, model_type="transencoder2s")
    tm.eval()
    params = _transenc_from_sd(_np_sd(tm), cfg)
    rng = np.random.RandomState(2)
    f = _rand_feats(rng, B, L, embedded=True)
    logits_j, probs_j = apply_transenc(params, cfg, f)
    logits_t, probs_t = _torch_forward_2s(tm, f, 0)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(probs_j), probs_t, atol=3e-5)


def test_attrnn_zero_h0_deterministic():
    """Engine default: zero h0 -> repeated forwards identical (the reference's randn
    h0 makes eval nondeterministic; this engine fixes that by default)."""
    cfg = AttRNNConfig(num_layers=2, hidden_size=32, dropout_rate=0)
    from ccsmeth_tpu.models import init_attrnn

    params = init_attrnn(0, cfg)
    f = _rand_feats(np.random.RandomState(0), 4, 21)
    l1, p1 = apply_attrnn(params, cfg, f)
    l2, p2 = apply_attrnn(params, cfg, f)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_attrnn_ss_parity():
    """Single-strand family (ModelAttRNNss, trainm-only in the reference)."""
    ref_models = import_reference_models()
    from ccsmeth_tpu.models import apply_attrnn_ss

    B, L, H, NL = 5, 21, 64, 2
    cfg = AttRNNConfig(seq_len=L, num_layers=NL, hidden_size=H, dropout_rate=0,
                       model_type="attbigru1s")
    torch.manual_seed(31)
    tm = ref_models.ModelAttRNNss(L, NL, 2, 0, H, model_type="attbigru1s")
    tm.eval()
    params = _attrnn_from_sd(_np_sd(tm), cfg)
    rng = np.random.RandomState(6)
    f = _rand_feats(rng, B, L, two=False)
    seed = 55
    (h0,) = torch_h0(seed, NL, B, H, 1)
    logits_j, probs_j = apply_attrnn_ss(params, cfg, f, h0=h0.numpy())
    t = lambda x: torch.tensor(x, dtype=torch.float)
    torch.manual_seed(seed)
    with torch.no_grad():
        logits_t, probs_t = tm(t(f["kmer"]), t(f["kpass"]), t(f["ipd_means"]),
                               t(f["ipd_stds"]), t(f["pw_means"]), t(f["pw_stds"]),
                               t(f["sns"]), t(f["maps"]))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(probs_j), probs_t.numpy(), atol=2e-5)
