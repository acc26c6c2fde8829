#!/usr/bin/env python
"""Subsample a modbam to target coverage fractions, run call_freqb on each
subsample, and report correlation vs BS-seq truth — the coverage-robustness
harness. Capability parity with /root/reference/scripts/subsample_and_eval_modbam.py
(samtools view -s replaced by an in-process random read filter).
"""

import argparse
import math
import os
import random
import sys

import numpy as np
import scipy.stats

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsmeth_tpu.bamio import BamReader, BamWriter  # noqa: E402
from ccsmeth_tpu.pipeline.call_freq_bam import (  # noqa: E402
    FreqBamConfig,
    call_mods_frequency_from_bamfile,
)


def subsample_bam(in_bam, out_bam, frac, seed):
    rng = random.Random(seed)
    reader = BamReader(in_bam)
    n = 0
    with BamWriter(out_bam, reader.header) as w:
        for rec in reader:
            if rng.random() < frac:
                w.write(rec)
                n += 1
    reader.close()
    return n


def read_bed_rmet(path, cov_cf=1):
    out = {}
    for line in open(path):
        w = line.strip().split("\t")
        if len(w) == 11 and w[8] == "0,0,0":  # bedMethyl
            if int(w[9]) >= cov_cf:
                out[(w[0], int(w[1]))] = float(w[10]) / 100.0
        elif len(w) == 11:  # freq.txt
            if int(w[8]) >= cov_cf:
                out[(w[0], int(w[1]))] = float(w[9])
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_bam", "-i", type=str, required=True)
    parser.add_argument("--ref", type=str, required=True)
    parser.add_argument("--bs_bed", type=str, required=True)
    parser.add_argument("--fracs", type=str, default="0.1,0.25,0.5,0.75,1.0")
    parser.add_argument("--wdir", type=str, default="subsample_eval")
    parser.add_argument("--call_mode", type=str, default="count",
                        choices=["count", "aggregate"])
    parser.add_argument("--aggre_model", type=str, default=None)
    parser.add_argument("--cov_cf", type=int, default=1)
    parser.add_argument("--bs_cov_cf", type=int, default=5)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    os.makedirs(args.wdir, exist_ok=True)
    truth = read_bed_rmet(args.bs_bed, args.bs_cov_cf)
    print("\t".join(["frac", "reads", "sites", "num_inter", "pearson", "rmse"]))
    for frac in [float(x) for x in args.fracs.split(",")]:
        sub_bam = os.path.join(args.wdir, "sub_{:.2f}.bam".format(frac))
        n = subsample_bam(args.input_bam, sub_bam, frac, args.seed)
        prefix = os.path.join(args.wdir, "sub_{:.2f}".format(frac))
        cfg = FreqBamConfig(input_bam=sub_bam, ref=args.ref, output=prefix,
                            call_mode=args.call_mode,
                            aggre_model=args.aggre_model, sort=True, bed=True)
        outs = call_mods_frequency_from_bamfile(cfg)
        all_out = [p for p in outs if ".all." in p]
        if not all_out:
            print("\t".join(["{:.2f}".format(frac), str(n), "0", "0", "nan", "nan"]))
            continue
        ours = read_bed_rmet(all_out[0], args.cov_cf)
        inter = sorted(set(ours) & set(truth))
        if len(inter) > 1:
            x = np.array([truth[k] for k in inter])
            y = np.array([ours[k] for k in inter])
            r, _ = scipy.stats.pearsonr(x, y)
            rmse = math.sqrt(float(np.mean((x - y) ** 2)))
            print("\t".join(["{:.2f}".format(frac), str(n), str(len(ours)),
                             str(len(inter)), "{:.4f}".format(r),
                             "{:.4f}".format(rmse)]))
        else:
            print("\t".join(["{:.2f}".format(frac), str(n), str(len(ours)),
                             str(len(inter)), "nan", "nan"]))


if __name__ == "__main__":
    main()
