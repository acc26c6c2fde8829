#!/usr/bin/env python
"""Build aggregate-model training rows from per-site prob lists + BS-seq truth.

The reference defines the AggreFeaData format (ccsmeth/dataloader.py:153-165:
chrom, pos, strand, offsets, histograms(;-joined), covs, label) but ships no
generator; this closes that gap. Input: the per-site file from
call_mods_freq_bam_per_readsite.py and a BS bedMethyl; output rows pair each
site's 11-site neighborhood histograms with the BS frequency bin label.
"""

import argparse

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def read_bs_bed(path, cov_cf):
    truth = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            if int(w[9]) >= cov_cf:
                truth[(w[0], int(w[1]))] = float(w[10]) / 100.0
    return truth


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per_site", "-i", type=str, required=True,
                        help="output of call_mods_freq_bam_per_readsite.py")
    parser.add_argument("--bs_bed", type=str, required=True,
                        help="BS-seq bedMethyl truth")
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--seq_len", type=int, default=11)
    parser.add_argument("--bin_size", type=int, default=20)
    parser.add_argument("--cov_cf", type=int, default=4)
    parser.add_argument("--bs_cov_cf", type=int, default=5)
    args = parser.parse_args()

    truth = read_bs_bed(args.bs_bed, args.bs_cov_cf)
    # group per (chrom, strand); accepts BOTH per_readsite formats: the compact
    # 5-column site list (probs comma-joined in col 4) and the reference's
    # 10-column per-read-site rows (one prob per row, col 7)
    groups = {}
    per_site: dict = {}
    with open(args.per_site) as rf:
        for line in rf:
            w = line.strip().split("\t")
            if len(w) >= 10:
                per_site.setdefault((w[0], int(w[1]), w[2]), []).append(float(w[7]))
            else:
                probs = np.asarray([float(x) for x in w[4].split(",")])
                groups.setdefault((w[0], w[2]), []).append((int(w[1]), probs))
    for (chrom, pos, strand), plist in sorted(per_site.items()):
        groups.setdefault((chrom, strand), []).append((pos, np.asarray(plist)))
    for g in groups.values():
        g.sort(key=lambda t: t[0])

    pad = args.seq_len // 2
    n = 0
    with open(args.output, "w") as wf:
        for (chrom, strand), sites in groups.items():
            sites.sort(key=lambda x: x[0])
            keep = [(p, pr) for p, pr in sites if len(pr) >= args.cov_cf]
            if len(keep) == 0:
                continue
            poses = np.asarray([p for p, _ in keep])
            histos = []
            covs = []
            for _p, pr in keep:
                h = np.histogram(pr, bins=args.bin_size, range=[0, 1])[0]
                norm = np.linalg.norm(h)
                histos.append(np.round(h / norm, 6) if norm else h.astype(float))
                covs.append(len(pr))
            hist_mat = np.pad(np.stack(histos), ((pad, pad), (0, 0)))
            hist_win = np.swapaxes(sliding_window_view(hist_mat, args.seq_len,
                                                       axis=0), 1, 2)
            pos_pad = np.pad(poses, (pad, pad), mode="constant",
                             constant_values=(poses[0] - 1000, poses[-1] + 1000))
            pos_win = sliding_window_view(pos_pad, args.seq_len)
            offsets = np.abs(pos_win - poses[:, None])
            cov_pad = np.pad(np.asarray(covs), (pad, pad))
            cov_win = sliding_window_view(cov_pad, args.seq_len)
            for k, (p, _pr) in enumerate(keep):
                if (chrom, p) not in truth:
                    continue
                label = truth[(chrom, p)]
                histo_str = ";".join(",".join("{:.6f}".format(v) for v in row)
                                     for row in hist_win[k])
                wf.write("\t".join([
                    chrom, str(p), strand,
                    ",".join(map(str, offsets[k])), histo_str,
                    ",".join(map(str, cov_win[k])),
                    "{:.4f}".format(label)]) + "\n")
                n += 1
    print("wrote {} aggregate training rows -> {}".format(n, args.output))


if __name__ == "__main__":
    main()
