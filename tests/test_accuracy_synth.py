"""End-to-end ACCURACY on synthetic truth (VERDICT r3 next #5): a planted
per-site methylation profile -> simulated HiFi kinetics -> extract -> train ->
call_mods -> call_freqb -> the shipped eval scripts, asserting a real AUC and
site-level Pearson r. This is the workflow the reference demo stands for
(/root/reference/demo: hg002 demo BAM + hg002_bsseq_chr20_demo.bed, absent
from the snapshot) and catches strand/combine/sign regressions that
row-level parity tests cannot.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from ccsmeth_tpu.cli import main
from ccsmeth_tpu.utils.simulate import (
    cpg_sites,
    make_methylated_bam,
    plant_truth,
    random_seq,
    write_fasta,
    write_truth_bed,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_ARGS = ["--layer_rnn", "1", "--hid_rnn", "24", "--dropout_rate", "0"]


def _extract(bam, fasta, out_tsv, label):
    rc = main(["extract", "-i", bam, "-o", out_tsv, "--mode", "align",
               "--ref", fasta, "--methy_label", str(label)])
    assert rc == 0 and os.path.exists(out_tsv)
    return open(out_tsv).read().splitlines()


def _run_script(name, *args):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, os.path.join(REPO, "scripts", name),
                          *args], capture_output=True, text=True, env=env,
                         timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


@pytest.fixture(scope="module")
def acc_env(tmp_path_factory):
    """Simulate, extract, and train once for the module: a 3 kb CpG-rich
    reference, fully-methylated / fully-unmethylated training molecules, and
    a small attbigru2s trained to discriminate the planted IPD shift."""
    d = tmp_path_factory.mktemp("accsynth")
    rng = np.random.RandomState(11)
    refseq = random_seq(rng, 3000)
    assert len(cpg_sites(refseq)) > 60
    fasta = str(d / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})

    # mosaic training molecules (every CpG i.i.d. 50% methylated) with exact
    # per-(read, site) labels from the simulator — neighbors in a window are
    # then uncorrelated with the center's label, so the model must read the
    # center site (all-or-nothing molecules let it cheat off the whole window)
    truth_half = {int(p): 0.5 for p in cpg_sites(refseq)}
    mixed = []
    for seed in (100, 200):
        bam = str(d / ("train_{}.bam".format(seed)))
        calls = make_methylated_bam(bam, refseq, truth_half, n_reads=70,
                                    seed=seed)
        for row in _extract(bam, fasta, str(d / "{}.tsv".format(seed)), 1):
            w = row.split("\t")
            site = int(w[1]) if w[2] == "+" else int(w[1]) - 1
            w[21] = str(calls[(w[3], site)])
            mixed.append("\t".join(w))
    assert len(mixed) > 800
    # hold out every 6th row for validation
    train_tsv, valid_tsv = str(d / "train.tsv"), str(d / "valid.tsv")
    with open(train_tsv, "w") as ft, open(valid_tsv, "w") as fv:
        for i, r in enumerate(mixed):
            (fv if i % 6 == 0 else ft).write(r + "\n")

    model_dir = str(d / "models")
    rc = main(["train", "--train_file", train_tsv, "--valid_file", valid_tsv,
               "--model_dir", model_dir, "--model_type", "attbigru2s",
               *MODEL_ARGS, "--batch_size", "128", "--max_epoch_num", "12",
               "--min_epoch_num", "4", "--step_interval", "10", "--lr", "0.01",
               "--lr_decay", "0.5", "--lr_decay_step", "4", "--tseed", "3"])
    assert rc == 0
    import glob

    # newest best-epoch checkpoint (mtime, not lexical: epoch10 < epoch4)
    ckpts = glob.glob(os.path.join(model_dir, "*betterthanlast*.ckpt.npz"))
    assert ckpts
    best = max(ckpts, key=os.path.getmtime)
    return {"dir": d, "refseq": refseq, "fasta": fasta, "ckpt": best}


def test_site_level_pearson_vs_planted_truth(acc_env):
    """Mixed-fraction profile -> call_mods (modbam) -> call_freqb count mode ->
    correlation_with_bs.py vs the planted bedMethyl: Pearson r above floor,
    checked both by the shipped script and independently in-test."""
    d, fasta, refseq = acc_env["dir"], acc_env["fasta"], acc_env["refseq"]
    rng = np.random.RandomState(42)
    truth = plant_truth(refseq, rng)
    bam = str(d / "test_mix.bam")
    make_methylated_bam(bam, refseq, truth, n_reads=160, seed=300)
    rc = main(["call_mods", "-i", bam, "-o", str(d / "mix"),
               "-m", acc_env["ckpt"], "--model_type", "attbigru2s",
               *MODEL_ARGS, "--mode", "align", "--ref", fasta, "-b", "256"])
    assert rc == 0
    modbam = str(d / "mix.modbam.bam")
    rc = main(["call_freqb", "-i", modbam, "--ref", fasta,
               "-o", str(d / "mixfreq"), "--sort"])
    assert rc == 0
    freq = str(d / "mixfreq.count.all.freq.txt")

    # independent check: per-site Rmet vs planted fraction
    got = {}
    for line in open(freq):
        w = line.rstrip("\n").split("\t")
        pos, cov, rmet = int(w[1]), int(w[8]), float(w[9])
        if cov >= 5:
            got[pos] = rmet
    common = sorted(set(got) & set(truth))
    assert len(common) >= 40, "too few covered CpG sites: {}".format(len(common))
    a = np.asarray([truth[p] for p in common])
    b = np.asarray([got[p] for p in common])
    r = float(np.corrcoef(a, b)[0, 1])
    assert r >= 0.85, "site-level Pearson r {} < 0.85 (n={})".format(
        r, len(common))

    # the shipped correlation script agrees (same workflow as the reference's
    # demo eval: correlation_with_bs.py vs a BS-seq bedMethyl)
    truth_bed = str(d / "truth.bed")
    write_truth_bed(truth_bed, truth)
    out = _run_script("correlation_with_bs.py", "--bs_file", truth_bed,
                      "--smrt_file", freq, "--bs_cov_cf", "1", "--cov_cf", "5")
    row = out.strip().splitlines()[-1].split("\t")
    assert float(row[2]) >= 0.85  # pearson column (test_scripts.py:314)


def test_read_level_auc_on_held_out_molecules(acc_env):
    """Held-out fully-meth / fully-unmeth molecules -> extract -> call_mods
    TSV path -> eval_at_readlevel.py: AUC above floor."""
    d, fasta, refseq = acc_env["dir"], acc_env["fasta"], acc_env["refseq"]
    per_readsite = {}
    for tag, frac, seed in (("m", 1.0, 400), ("u", 0.0, 500)):
        truth = {int(p): frac for p in cpg_sites(refseq)}
        bam = str(d / ("ho_{}.bam".format(tag)))
        make_methylated_bam(bam, refseq, truth, n_reads=40, seed=seed)
        tsv = str(d / ("ho_{}.tsv".format(tag)))
        _extract(bam, fasta, tsv, 1 if frac else 0)
        rc = main(["call_mods", "-i", tsv, "-o", str(d / ("pr_" + tag)),
                   "-m", acc_env["ckpt"], "--model_type", "attbigru2s",
                   *MODEL_ARGS, "-b", "256"])
        assert rc == 0
        per_readsite[tag] = str(d / ("pr_{}.per_readsite.tsv".format(tag)))

    res = str(d / "eval.tsv")
    _run_script("eval_at_readlevel.py", "--methylated", per_readsite["m"],
                "--unmethylated", per_readsite["u"], "--depth_cf", "0",
                "--prob_cf", "0.0", "--round", "1", "--result_file", res)
    lines = open(res).read().splitlines()
    header = lines[0].split("\t")
    auc_col = header.index("AUC") if "AUC" in header else -3
    auc = float(lines[1].split("\t")[auc_col])
    assert auc >= 0.95, "read-level AUC {} < 0.95".format(auc)

    # and the engine's own calls are directionally right: mean prob1 of
    # methylated molecules far above unmethylated ones
    def mean_p1(path):
        v = [float(l.split("\t")[7]) for l in open(path)]
        return float(np.mean(v))

    assert mean_p1(per_readsite["m"]) > mean_p1(per_readsite["u"]) + 0.4
