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
    parser.add_argument("--bs_file", "--bsfile", dest="bs_file", type=str,
                        required=True)
    parser.add_argument("--smrt_file", "--tgsfile", dest="smrt_file", type=str,
                        required=True)
    parser.add_argument("--contig_prefix", type=str, default=None)
    parser.add_argument("--contig_names", type=str, default=None)
    parser.add_argument("--bs_cov_cf", "--cov_cf_bs", dest="bs_cov_cf", type=int,
                        default=5)
    parser.add_argument("--cov_cf", type=int, default=5,
                        help="coverage cutoff on the tgs file before binning")
    parser.add_argument("--repeat", type=int, default=1,
                        help="resampling repeats per coverage bin")
    parser.add_argument("--wfile", type=str, default=None,
                        help="also write the table here")
    parser.add_argument("--bs_id", type=str, default="bs",
                        help="label for the BS column in the output")
    parser.add_argument("--cov_bins", type=str, default="1,2,3,4,5,6,8,10,15,20",
                        help="coverage bin lower edges")
    args = parser.parse_args()

    _mc, bs = read_methylbed(args.bs_file, args.contig_prefix, args.contig_names,
                             args.bs_cov_cf)
    smrt = read_freqtxt(args.smrt_file, args.contig_prefix, args.contig_names,
                        args.cov_cf)
    bs_map = dict(zip(bs["key"], bs["Rmet"]))
    edges = [int(x) for x in args.cov_bins.split(",")] + [10 ** 9]
    rng = np.random.RandomState(0)
    header = "\t".join(["cov_bin", "num_inter", "pearson", "spearman", "rmse",
                        "vs"])
    out_lines = [header]
    for lo, hi in zip(edges[:-1], edges[1:]):
        sub = smrt[(smrt["coverage"] >= lo) & (smrt["coverage"] < hi)]
        keys = [k for k in sub["key"] if k in bs_map]
        if len(keys) < 3:
            out_lines.append("\t".join(["[{},{})".format(lo, hi), str(len(keys)),
                                        "nan", "nan", "nan", args.bs_id]))
            continue
        sub_i = sub[sub["key"].isin(set(keys))].drop_duplicates("key")
        x_all = np.array([bs_map[k] for k in sub_i["key"]])
        y_all = np.asarray(sub_i["Rmet"], dtype=float)
        pears, spears, rmses = [], [], []
        for rep in range(max(args.repeat, 1)):
            if args.repeat > 1:
                sel = rng.choice(len(x_all), size=len(x_all), replace=True)
                x, y = x_all[sel], y_all[sel]
            else:
                x, y = x_all, y_all
            pear, _ = scipy.stats.pearsonr(x, y)
            spear, _ = scipy.stats.spearmanr(x, y)
            pears.append(pear)
            spears.append(spear)
            rmses.append(math.sqrt(mean_squared_error(x, y)))
        out_lines.append("\t".join([
            "[{},{})".format(lo, hi), str(len(keys)),
            "{:.4f}".format(float(np.mean(pears))),
            "{:.4f}".format(float(np.mean(spears))),
            "{:.4f}".format(float(np.mean(rmses))), args.bs_id]))
    print("\n".join(out_lines))
    if args.wfile:
        with open(args.wfile, "w") as wf:
            wf.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    main()
