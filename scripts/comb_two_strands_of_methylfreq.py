#!/usr/bin/env python
"""Combine the +/- strand records of each CpG into one forward-strand record.

Capability parity with /root/reference/scripts/comb_two_strands_of_methylfreq.py:
supports ccsmeth freq.txt ('--format freqtxt'), bismark CpG reports
('--format bismark_cgreport') and bedMethyl ('--format bed').
"""

import argparse


def combine_freqtxt(path):
    pos2info = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            key = (w[0], int(w[1]) - 1 if w[3] == "-" else int(w[1]))
            prob0, prob1 = float(w[4]), float(w[5])
            met, unmet, cov = int(w[6]), int(w[7]), int(w[8])
            kmer = w[10]
            info = pos2info.setdefault(key, [0.0, 0.0, 0, 0, 0, 0.0, ""])
            info[0] += prob0
            info[1] += prob1
            info[2] += met
            info[3] += unmet
            info[4] += cov
            if w[3] == "+":
                info[6] = kmer
    out = []
    for key in sorted(pos2info.keys()):
        info = pos2info[key]
        if info[4] == 0:
            continue
        info[5] = round(float(info[2]) / info[4], 4)
        out.append("\t".join(map(str, [key[0], key[1], key[1] + 1, "+"] + info)))
    return out


def combine_bed(path):
    pos2info = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            chrom, pos, strand = w[0], int(w[1]), w[5]
            cov = int(w[9])
            met = cov * int(w[10]) / 100.0
            key = (chrom, pos - 1 if strand == "-" else pos)
            info = pos2info.setdefault(key, [0, 0.0])
            info[0] += cov
            info[1] += met
    out = []
    for key in sorted(pos2info.keys()):
        cov, met = pos2info[key]
        if cov == 0:
            continue
        pct = int(round(met / cov * 100 + 0.001, 0))
        out.append("\t".join(map(str, [key[0], key[1], key[1] + 1, ".", cov, "+",
                                       key[1], key[1] + 1, "0,0,0", cov, pct])))
    return out


def combine_bismark_cgreport(path):
    pos2info = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            chrom, pos, strand = w[0], int(w[1]), w[2]
            cnt_m, cnt_um = int(w[3]), int(w[4])
            motif, context = (w[5], w[6]) if len(w) > 6 else ("", "")
            if strand == "-":
                pos -= 1
            pos2info.setdefault((chrom, pos), []).append(
                (strand, cnt_m, cnt_um, motif, context))
    out = []
    for key in sorted(pos2info.keys()):
        infos = pos2info[key]
        if len(infos) == 1:
            strand, cnt_m, cnt_um, motif, context = infos[0]
        elif len(infos) == 2:
            strand, cnt_m, cnt_um, motif, context = "+", 0, 0, "", ""
            for s, m, u, mo, co in infos:
                if s == "+":
                    motif, context = mo, co
                cnt_m += m
                cnt_um += u
        else:
            continue
        out.append("\t".join(map(str, [key[0], key[1], strand, cnt_m, cnt_um,
                                       motif, context])))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--report_fp", "--freq_file", dest="report_fp", type=str, required=True)
    parser.add_argument("--format", type=str, default="freqtxt",
                        choices=["freqtxt", "bed", "bismark_cgreport"])
    parser.add_argument("--wfile", "--out", dest="wfile", type=str, default=None)
    args = parser.parse_args()

    fn = {"freqtxt": combine_freqtxt, "bed": combine_bed,
          "bismark_cgreport": combine_bismark_cgreport}[args.format]
    rows = fn(args.report_fp)
    wfile = args.wfile or args.report_fp + ".comb.tsv"
    with open(wfile, "w") as wf:
        wf.write("\n".join(rows) + ("\n" if rows else ""))
    print("wrote {} combined sites -> {}".format(len(rows), wfile))


if __name__ == "__main__":
    main()
