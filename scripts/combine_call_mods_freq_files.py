#!/usr/bin/env python
"""Merge multiple freq.txt files (e.g. per-flowcell runs) site-by-site: counts and
prob sums add, rmet recomputed. Capability parity with
/root/reference/scripts/combine_call_mods_freq_files.py (10- and 11-col formats).
"""

import argparse


def read_one(path):
    info = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            key = (w[0], int(w[1]), w[2])
            if len(w) == 11:
                # chrom pos end strand prob0 prob1 met unmet cov rmet kmer
                info[key] = [float(w[4]), float(w[5]), int(w[6]), int(w[7]),
                             int(w[8]), float(w[9]), w[10]]
            elif len(w) == 10:
                info[key] = [float(w[3]), float(w[4]), int(w[5]), int(w[6]),
                             int(w[7]), float(w[8]), w[9]]
            else:
                raise ValueError("input format wrong!")
    return info


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--freqfile", "-i", type=str, action="append", default=None)
    parser.add_argument("--modspath", type=str, default=None,
                        help="directory of freq files to combine (reference "
                             "interface); filtered by --file_uid when given")
    parser.add_argument("--file_uid", type=str, default=None,
                        help="only combine files whose name contains this uid")
    parser.add_argument("--wfile", "-o", type=str, required=True)
    parser.add_argument("--sort", action="store_true", default=False)
    parser.add_argument("--bed", action="store_true", default=False,
                        help="write bedMethyl instead of freq.txt")
    args = parser.parse_args()
    if args.freqfile is None:
        if args.modspath is None:
            parser.error("provide --freqfile/-i or --modspath")
        import os as _os

        args.freqfile = sorted(
            _os.path.join(args.modspath, f) for f in _os.listdir(args.modspath)
            if _os.path.isfile(_os.path.join(args.modspath, f))
            and (args.file_uid is None or args.file_uid in f))
        if not args.freqfile:
            parser.error("no files matched in --modspath")

    combined = {}
    for path in args.freqfile:
        for key, v in read_one(path).items():
            c = combined.setdefault(key, [0.0, 0.0, 0, 0, 0, 0.0, "-"])
            c[0] += v[0]
            c[1] += v[1]
            c[2] += v[2]
            c[3] += v[3]
            c[4] += v[4]
            c[6] = v[6]
    for c in combined.values():
        c[5] = c[2] / float(c[4]) if c[4] else 0.0
    keys = sorted(combined.keys()) if args.sort else list(combined.keys())
    with open(args.wfile, "w") as wf:
        for chrom, pos, strand in keys:
            p0, p1, met, unmet, cov, rmet, kmer = combined[(chrom, pos, strand)]
            if args.bed:
                wf.write("\t".join([chrom, str(pos), str(pos + 1), ".", str(cov),
                                    strand, str(pos), str(pos + 1), "0,0,0",
                                    str(cov),
                                    str(int(round(rmet * 100 + 0.001, 0)))]) + "\n")
            else:
                wf.write("%s\t%d\t%d\t%s\t%.3f\t%.3f\t%d\t%d\t%d\t%.4f\t%s\n" % (
                    chrom, pos, pos + 1, strand, p0, p1, met, unmet, cov,
                    rmet + 0.000001, kmer))
    print("combined {} files, {} sites -> {}".format(len(args.freqfile),
                                                     len(combined), args.wfile))


if __name__ == "__main__":
    main()
