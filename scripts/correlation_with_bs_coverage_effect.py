#!/usr/bin/env python
"""Correlation vs BS-seq stratified by coverage bins — how accuracy depends on
per-site coverage. Capability parity with
/root/reference/scripts/correlation_with_bs.coverage_effect.py.
"""

import argparse
import math

import numpy as np
import scipy.stats
from sklearn.metrics import mean_squared_error

from correlation_with_bs import read_freqtxt, read_methylbed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs_file", type=str, required=True)
    parser.add_argument("--smrt_file", type=str, required=True)
    parser.add_argument("--contig_prefix", type=str, default=None)
    parser.add_argument("--contig_names", type=str, default=None)
    parser.add_argument("--bs_cov_cf", type=int, default=5)
    parser.add_argument("--cov_bins", type=str, default="1,2,3,4,5,6,8,10,15,20",
                        help="coverage bin lower edges")
    args = parser.parse_args()

    _mc, bs = read_methylbed(args.bs_file, args.contig_prefix, args.contig_names,
                             args.bs_cov_cf)
    smrt = read_freqtxt(args.smrt_file, args.contig_prefix, args.contig_names, 1)
    bs_map = dict(zip(bs["key"], bs["Rmet"]))
    edges = [int(x) for x in args.cov_bins.split(",")] + [10 ** 9]
    print("\t".join(["cov_bin", "num_inter", "pearson", "spearman", "rmse"]))
    for lo, hi in zip(edges[:-1], edges[1:]):
        sub = smrt[(smrt["coverage"] >= lo) & (smrt["coverage"] < hi)]
        keys = [k for k in sub["key"] if k in bs_map]
        if len(keys) < 3:
            print("\t".join(["[{},{})".format(lo, hi), str(len(keys)), "nan",
                             "nan", "nan"]))
            continue
        sub_i = sub[sub["key"].isin(set(keys))].drop_duplicates("key")
        x = np.array([bs_map[k] for k in sub_i["key"]])
        y = np.asarray(sub_i["Rmet"], dtype=float)
        pear, _ = scipy.stats.pearsonr(x, y)
        spear, _ = scipy.stats.spearmanr(x, y)
        rmse = math.sqrt(mean_squared_error(x, y))
        print("\t".join(["[{},{})".format(lo, hi), str(len(keys)),
                         "{:.4f}".format(pear), "{:.4f}".format(spear),
                         "{:.4f}".format(rmse)]))


if __name__ == "__main__":
    main()
