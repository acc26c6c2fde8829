"""Aggregate-model training: learns on synthetic histogram data and the saved
ckpt drives call_freqb aggregate mode."""

import glob

import numpy as np

from ccsmeth_tpu.training.aggregate import (
    AggreTrainConfig,
    load_aggre_tsv,
    train_aggregate,
)


def _write_aggre_tsv(path, n=300, seed=0, seq_len=11, binsize=20):
    """Rows whose center-site histogram mass position encodes the label."""
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for i in range(n):
            label = float(rng.rand())
            histos = []
            for k in range(seq_len):
                probs = rng.binomial(1, label, size=12) + rng.rand(12) * 0.1
                h = np.histogram(np.clip(probs, 0, 1), bins=binsize,
                                 range=[0, 1])[0]
                norm = np.linalg.norm(h)
                histos.append(np.round(h / norm, 6) if norm else h)
            offsets = np.abs(np.arange(seq_len) - seq_len // 2) * 2
            f.write("\t".join([
                "chr1", str(1000 + 2 * i), "+",
                ",".join(map(str, offsets)),
                ";".join(",".join("{:.6f}".format(v) for v in h) for h in histos),
                ",".join(["12"] * seq_len),
                "{:.4f}".format(label)]) + "\n")


def test_load_aggre_tsv(tmp_path):
    p = str(tmp_path / "a.tsv")
    _write_aggre_tsv(p, n=20)
    d = load_aggre_tsv(p)
    assert d["offsets"].shape == (20, 11)
    assert d["histos"].shape == (20, 11, 20)
    assert d["labels"].shape == (20,)


def test_aggregate_training_learns(tmp_path):
    tr = str(tmp_path / "tr.tsv")
    va = str(tmp_path / "va.tsv")
    _write_aggre_tsv(tr, n=400, seed=1)
    _write_aggre_tsv(va, n=100, seed=2)
    cfg = AggreTrainConfig(
        train_file=tr, valid_file=va, model_dir=str(tmp_path / "m"),
        hid_rnn=16, batch_size=64, max_epoch_num=8, min_epoch_num=3,
        dropout_rate=0.1, lr=0.01, tseed=3)
    result = train_aggregate(cfg)
    assert result["best_rmse"] < 0.3  # random guessing gives ~0.41; 12-draw
    # binomial histograms put the irreducible noise floor near 0.15-0.2
    saved = glob.glob(str(tmp_path / "m" / "*.ckpt.npz"))
    assert saved
    # the saved ckpt loads into the call_freqb aggregate predictor
    from ccsmeth_tpu.pipeline.call_freq_bam import AggrPredictor, FreqBamConfig

    fcfg = FreqBamConfig(aggre_model=sorted(saved)[-1], hid_rnn=16)
    pred = AggrPredictor(fcfg)
    d = load_aggre_tsv(va)
    out = pred.predict(d["offsets"][:32], d["histos"][:32])
    rmse = float(np.sqrt(np.mean((out - d["labels"][:32]) ** 2)))
    assert rmse < 0.3
