#!/usr/bin/env python
"""Differentially methylated region (DMR) calling between two haplotypes (or any
two per-site frequency files).

Capability parity with /root/reference/scripts/hap/call_dmr_dss_nanomethphase.py +
DSS_DMA.R (the reference shells out to Bioconductor DSS). This implementation is
pure Python: per-site two-proportion z-tests with counts smoothed over a sliding
window, then merging of consecutive significant CpGs into regions — the standard
DSS-style DML->DMR recipe.
"""

import argparse
import math

import numpy as np
import scipy.stats


def read_freq(path):
    """freq.txt (11 col) or bedMethyl -> {(chrom,pos): (met, cov)}."""
    out = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            if len(w) == 11 and w[8] == "0,0,0":  # bedMethyl
                cov = int(w[9])
                met = cov * float(w[10]) / 100.0
                out[(w[0], int(w[1]))] = (met, cov)
            elif len(w) == 11:
                out[(w[0], int(w[1]))] = (float(w[6]), int(w[8]))
    return out


def smooth_counts(positions, mets, covs, span=500):
    """Window-sum counts over +-span bp (DSS-like smoothing)."""
    sm_met = np.empty_like(mets)
    sm_cov = np.empty_like(covs)
    left = np.searchsorted(positions, positions - span, side="left")
    right = np.searchsorted(positions, positions + span, side="right")
    cm = np.concatenate([[0.0], np.cumsum(mets)])
    cc = np.concatenate([[0.0], np.cumsum(covs)])
    sm_met[:] = cm[right] - cm[left]
    sm_cov[:] = cc[right] - cc[left]
    return sm_met, sm_cov


def dml_test(m1, c1, m2, c2):
    """Two-proportion z-test p-value and delta."""
    if c1 <= 0 or c2 <= 0:
        return 1.0, 0.0
    p1 = m1 / c1
    p2 = m2 / c2
    p = (m1 + m2) / (c1 + c2)
    se = math.sqrt(max(p * (1 - p) * (1 / c1 + 1 / c2), 1e-12))
    z = (p1 - p2) / se
    return 2 * (1 - scipy.stats.norm.cdf(abs(z))), p1 - p2


def call_dmrs(f1, f2, min_cov=3, span=500, p_cf=0.001, delta_cf=0.1,
              min_cpgs=3, max_gap=1000, min_len=50):
    sites1 = read_freq(f1)
    sites2 = read_freq(f2)
    common = sorted(set(sites1) & set(sites2))
    # group per chrom
    by_chrom = {}
    for key in common:
        m1, c1 = sites1[key]
        m2, c2 = sites2[key]
        if c1 < min_cov or c2 < min_cov:
            continue
        by_chrom.setdefault(key[0], []).append((key[1], m1, c1, m2, c2))
    dmrs = []
    for chrom, rows in by_chrom.items():
        rows.sort()
        pos = np.array([r[0] for r in rows], dtype=np.int64)
        m1 = np.array([r[1] for r in rows], float)
        c1 = np.array([r[2] for r in rows], float)
        m2 = np.array([r[3] for r in rows], float)
        c2 = np.array([r[4] for r in rows], float)
        sm1, sc1 = smooth_counts(pos, m1, c1, span)
        sm2, sc2 = smooth_counts(pos, m2, c2, span)
        sig = np.zeros(len(pos), dtype=bool)
        deltas = np.zeros(len(pos))
        for i in range(len(pos)):
            p, d = dml_test(sm1[i], sc1[i], sm2[i], sc2[i])
            deltas[i] = d
            sig[i] = p < p_cf and abs(d) >= delta_cf
        # merge consecutive significant sites into regions
        i = 0
        while i < len(pos):
            if not sig[i]:
                i += 1
                continue
            j = i
            while j + 1 < len(pos) and sig[j + 1] and pos[j + 1] - pos[j] <= max_gap \
                    and np.sign(deltas[j + 1]) == np.sign(deltas[i]):
                j += 1
            n_cpg = j - i + 1
            length = int(pos[j] - pos[i] + 1)
            if n_cpg >= min_cpgs and length >= min_len:
                seg = slice(i, j + 1)
                mu1 = float(m1[seg].sum() / max(c1[seg].sum(), 1))
                mu2 = float(m2[seg].sum() / max(c2[seg].sum(), 1))
                dmrs.append((chrom, int(pos[i]), int(pos[j]) + 1, n_cpg,
                             round(mu1, 4), round(mu2, 4), round(mu1 - mu2, 4)))
            i = j + 1
    return dmrs


def main():
    parser = argparse.ArgumentParser(
        description="call DMRs between two haplotype frequency files")
    parser.add_argument("--hp1", type=str, required=True,
                        help="freq.txt/bedMethyl of haplotype 1")
    parser.add_argument("--hp2", type=str, required=True,
                        help="freq.txt/bedMethyl of haplotype 2")
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--min_cov", type=int, default=3)
    parser.add_argument("--smooth_span", type=int, default=500)
    parser.add_argument("--p_cf", type=float, default=0.001)
    parser.add_argument("--delta_cf", type=float, default=0.1)
    parser.add_argument("--min_cpgs", type=int, default=3)
    parser.add_argument("--max_gap", type=int, default=1000)
    parser.add_argument("--min_len", type=int, default=50)
    args = parser.parse_args()

    dmrs = call_dmrs(args.hp1, args.hp2, args.min_cov, args.smooth_span,
                     args.p_cf, args.delta_cf, args.min_cpgs, args.max_gap,
                     args.min_len)
    with open(args.output, "w") as wf:
        wf.write("chrom\tstart\tend\tn_cpgs\tmeth_hp1\tmeth_hp2\tdelta\n")
        for d in dmrs:
            wf.write("\t".join(map(str, d)) + "\n")
    print("called {} DMRs -> {}".format(len(dmrs), args.output))


if __name__ == "__main__":
    main()
