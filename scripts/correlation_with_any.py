#!/usr/bin/env python
"""Correlation between ANY two per-site methylation-frequency files (freq.txt or
bedMethyl), with coverage cutoffs — generalization of correlation_with_bs.py
(capability parity with /root/reference/scripts/correlation_with_any.py)."""

import argparse
import math

import numpy as np
import scipy.stats
from sklearn.metrics import mean_squared_error

from correlation_with_bs import read_freqtxt, read_methylbed


def _read_any(path, contig_prefix, contig_names, cov_cf):
    with open(path) as rf:
        ncols = len(rf.readline().strip().split("\t"))
    if ncols == 11:
        first = open(path).readline().split("\t")
        # bedMethyl col5 is strand symbol; freq.txt col3 is strand
        if first[5] in "+-." and first[3] not in "+-":
            return read_methylbed(path, contig_prefix, contig_names, cov_cf)[1]
    return read_freqtxt(path, contig_prefix, contig_names, cov_cf)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--file_a", "--tgs_file", dest="file_a", type=str,
                        required=True)
    parser.add_argument("--file_b", "--cmp_file", dest="file_b", type=str,
                        required=True, action="append")
    parser.add_argument("--contig_prefix", type=str, default=None)
    parser.add_argument("--contig_names", type=str, default=None)
    parser.add_argument("--cov_cf_a", "--cov_cf", dest="cov_cf_a", type=int,
                        default=5)
    parser.add_argument("--cov_cf_b", "--cov_cf_cmp", dest="cov_cf_b", type=int,
                        default=5)
    args = parser.parse_args()

    a = _read_any(args.file_a, args.contig_prefix, args.contig_names, args.cov_cf_a)
    print("\t".join(["file_b", "num_inter", "pearson", "rsquare", "spearman",
                     "rmse", "sites_a", "sites_b"]))
    for fb in args.file_b:
        b = _read_any(fb, args.contig_prefix, args.contig_names, args.cov_cf_b)
        inter = set(a["key"]) & set(b["key"])
        if len(inter) < 2:
            print("\t".join([fb, str(len(inter))] + ["nan"] * 4
                            + [str(len(a)), str(len(b))]))
            continue
        ai = a[a["key"].isin(inter)].drop_duplicates("key").sort_values(by="key")
        bi = b[b["key"].isin(inter)].drop_duplicates("key").sort_values(by="key")
        x = np.asarray(ai["Rmet"], dtype=float)
        y = np.asarray(bi["Rmet"], dtype=float)
        pearson, _ = scipy.stats.pearsonr(x, y)
        spearman, _ = scipy.stats.spearmanr(x, y)
        rmse = math.sqrt(mean_squared_error(x, y))
        print("\t".join([fb, str(len(inter)), "{:.4f}".format(pearson),
                         "{:.4f}".format(pearson ** 2), "{:.4f}".format(spearman),
                         "{:.4f}".format(rmse), str(len(a)), str(len(b))]))


if __name__ == "__main__":
    main()
