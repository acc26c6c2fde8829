#!/usr/bin/env python
"""Site-level correlation of ccsmeth-tpu methylation frequencies vs BS-seq.

Capability parity with /root/reference/scripts/correlation_with_bs.py: reads a
bedMethyl (BS truth) and a freq.txt/bedMethyl from this engine, intersects sites,
reports Pearson/Spearman r, RMSE, and site counts at coverage cutoffs.
"""

import argparse
import math

import numpy as np
import pandas as pd
import scipy.stats
from sklearn.metrics import mean_squared_error

SEP = "||"


def read_methylbed(bed_file, contig_prefix, contig_names, cov_cf):
    df = pd.read_csv(bed_file, sep="\t", header=None,
                     names=["chromosome", "pos", "end", "na1", "na2", "strand",
                            "na3", "na4", "na5", "coverage", "rpercent"],
                     dtype={"chromosome": str})
    df["Rmet"] = df["rpercent"] / 100.0
    if contig_prefix is not None:
        df = df[df["chromosome"].str.startswith(contig_prefix)]
    elif contig_names is not None:
        df = df[df["chromosome"].isin(set(contig_names.split(",")))]
    df["key"] = df["chromosome"] + SEP + df["pos"].astype(str)
    meancov = df["coverage"].mean()
    df = df[df["coverage"] >= cov_cf]
    return meancov, df[["chromosome", "pos", "coverage", "Rmet", "key"]].sort_values(
        by=["chromosome", "pos"])


def read_freqtxt(path, contig_prefix, contig_names, cov_cf):
    with open(path) as rf:
        fields = rf.readline().strip().split("\t")
    # bedMethyl also has 11 columns; its col9 is the RGB placeholder "0,0,0"
    if len(fields) == 11 and fields[8] != "0,0,0":
        names = ["chromosome", "pos", "end", "strand", "prob0", "prob1", "met",
                 "unmet", "coverage", "Rmet", "kmer"]
        df = pd.read_csv(path, sep="\t", header=None, names=names,
                         dtype={"chromosome": str})
    else:
        return read_methylbed(path, contig_prefix, contig_names, cov_cf)[1]
    if contig_prefix is not None:
        df = df[df["chromosome"].str.startswith(contig_prefix)]
    elif contig_names is not None:
        df = df[df["chromosome"].isin(set(contig_names.split(",")))]
    df["key"] = df["chromosome"] + SEP + df["pos"].astype(str)
    df = df[df["coverage"] >= cov_cf]
    return df[["chromosome", "pos", "coverage", "Rmet", "key"]].sort_values(
        by=["chromosome", "pos"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs_file", type=str, required=True,
                        help="BS-seq bedMethyl truth")
    parser.add_argument("--smrt_file", "--tgs_file", dest="smrt_file", type=str,
                        required=True, action="append",
                        help="ccsmeth-tpu freq.txt or bedMethyl; repeatable")
    parser.add_argument("--contig_prefix", type=str, default=None)
    parser.add_argument("--contig_names", type=str, default=None)
    parser.add_argument("--bs_cov_cf", "--cov_cf_bs", dest="bs_cov_cf", type=int,
                        default=5)
    parser.add_argument("--cov_cf", type=int, default=5)
    args = parser.parse_args()

    bs_meancov, bs = read_methylbed(args.bs_file, args.contig_prefix,
                                    args.contig_names, args.bs_cov_cf)
    print("bs: {} sites (cov>={}), mean cov {:.2f}".format(len(bs), args.bs_cov_cf,
                                                           bs_meancov))
    print("\t".join(["file", "num_inter", "pearson", "rsquare", "spearman",
                     "rmse", "smrt_sites", "bs_sites"]))
    for smrt_file in args.smrt_file:
        smrt = read_freqtxt(smrt_file, args.contig_prefix, args.contig_names,
                            args.cov_cf)
        inter = set(bs["key"]) & set(smrt["key"])
        bs_i = bs[bs["key"].isin(inter)].sort_values(by="key")
        sm_i = smrt[smrt["key"].isin(inter)].drop_duplicates("key").sort_values(by="key")
        if len(inter) < 2:
            print("\t".join([smrt_file, str(len(inter))] + ["nan"] * 4
                            + [str(len(smrt)), str(len(bs))]))
            continue
        x = np.asarray(bs_i["Rmet"], dtype=float)
        y = np.asarray(sm_i["Rmet"], dtype=float)
        pearson, _p = scipy.stats.pearsonr(x, y)
        spearman, _p2 = scipy.stats.spearmanr(x, y)
        rmse = math.sqrt(mean_squared_error(x, y))
        print("\t".join([smrt_file, str(len(inter)),
                         "{:.4f}".format(pearson), "{:.4f}".format(pearson ** 2),
                         "{:.4f}".format(spearman), "{:.4f}".format(rmse),
                         str(len(smrt)), str(len(bs))]))


if __name__ == "__main__":
    main()
