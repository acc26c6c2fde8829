#!/usr/bin/env python
"""End-to-end ccsmeth-tpu demo on synthetic data — no external files or tools.

Simulates an aligned HiFi BAM with kinetics tags, trains a tiny attbigru2s model
on synthetic separable features, calls 5mCpG per read (modbam MM/ML tags), and
aggregates per-site frequencies (bedMethyl + freq.txt). Runs on CPU or TPU;
add --rnn_backend pallas on TPU for the fused-kernel fast path.

    python examples/run_demo.py [--outdir DIR] [--rnn_backend xla|pallas]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_train_tsv(path: str, n: int, seed: int, seq_len: int = 21) -> None:
    """Separable synthetic features: label-1 rows get an ipd shift at the center."""
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for i in range(n):
            label = i % 2
            kmer = "".join("ACGT"[b] for b in rng.randint(0, 4, seq_len))
            ipd = rng.randn(seq_len)
            if label:
                ipd[seq_len // 2] += 2.0
            pw = rng.randn(seq_len)
            fmt = lambda a: ",".join(str(round(float(v), 6)) for v in a)
            row = ["chrS", str(i), "+", "m0/{}/ccs".format(i), str(i), kmer, "8",
                   fmt(ipd), ".", fmt(pw), ".", ".", ".", kmer, "8", fmt(ipd), ".",
                   fmt(pw), ".", ".", ".", str(label)]
            f.write("\t".join(row) + "\n")


def main() -> None:
    # CCS_FORCE_CPU pins the CPU backend even when a sitecustomize-registered
    # accelerator plugin overrides JAX_PLATFORMS (same knob as the CLI).
    if os.environ.get("CCS_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="demo_out")
    ap.add_argument("--rnn_backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--n_reads", type=int, default=30)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    j = lambda *p: os.path.join(args.outdir, *p)

    from ccsmeth_tpu.utils.simulate import make_synth_bam, write_fasta

    print("[1/4] simulating aligned HiFi BAM with kinetics tags...")
    refseq, _ = make_synth_bam(j("hifi.pbmm2.bam"), n_reads=args.n_reads,
                               read_len=400, ref_len=4000, seed=7)
    write_fasta(j("ref.fa"), {"chrS": refseq})

    print("[2/4] training a small attbigru2s model on synthetic features...")
    _write_train_tsv(j("train.tsv"), 1600, seed=0)
    _write_train_tsv(j("valid.tsv"), 400, seed=1)
    from ccsmeth_tpu.training.train import TrainConfig, train

    res = train(TrainConfig(
        train_file=j("train.tsv"), valid_file=j("valid.tsv"),
        model_dir=j("model"), model_type="attbigru2s", layer_rnn=2, hid_rnn=64,
        batch_size=256, max_epoch_num=2, min_epoch_num=1, step_interval=4,
        rnn_backend=args.rnn_backend))
    ckpt = res["ckpts"][-1]
    print("      best accuracy {:.3f} -> {}".format(res["best_accuracy"], ckpt))

    print("[3/4] call_mods: BAM -> modbam (MM/ML tags)...")
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam

    modbam = call_mods_bam(CallModsConfig(
        model_file=ckpt, model_type="attbigru2s", layer_rnn=2, hid_rnn=64,
        mode="align", ref=j("ref.fa"), batch_size=128,
        rnn_backend=args.rnn_backend), j("hifi.pbmm2.bam"), j("demo"))

    print("[4/4] call_freqb: modbam -> per-site frequencies...")
    from ccsmeth_tpu.pipeline.call_freq_bam import (FreqBamConfig,
                                                    call_mods_frequency_from_bamfile)

    outs = call_mods_frequency_from_bamfile(FreqBamConfig(
        input_bam=modbam, ref=j("ref.fa"), output=j("freq"), bed=True, sort=True))
    for p in outs:
        n = sum(1 for _ in open(p))
        print("      {} ({} sites)".format(p, n))
    print("demo complete; outputs in {}/".format(args.outdir))


if __name__ == "__main__":
    main()
