#!/usr/bin/env python
"""Convert a ccsmeth freq.txt (11-col) file to bedMethyl.

Capability parity with /root/reference/scripts/freq2bedmethyl.py.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--freqfile", type=str, required=True, help="freq.txt file")
    parser.add_argument("--covcf", type=int, default=1)
    parser.add_argument("--wfile", type=str, default=None)
    parser.add_argument("--sort", action="store_true", default=False)
    args = parser.parse_args()

    freqinfo = {}
    with open(args.freqfile) as rf:
        for line in rf:
            w = line.strip().split("\t")
            chrom, pos, strand = w[0], int(w[1]), w[3]
            cov = int(w[8])
            rmet = float(w[9])
            if cov >= args.covcf:
                freqinfo[(chrom, pos, strand)] = (cov, rmet)
    keys = sorted(freqinfo.keys()) if args.sort else list(freqinfo.keys())
    fname, _ = os.path.splitext(args.freqfile)
    wfile = args.wfile if args.wfile is not None else fname + ".bed"
    with open(wfile, "w") as wf:
        for chrom, pos, strand in keys:
            cov, rmet = freqinfo[(chrom, pos, strand)]
            wf.write("\t".join([chrom, str(pos), str(pos + 1), ".", str(cov), strand,
                                str(pos), str(pos + 1), "0,0,0", str(cov),
                                str(int(round(rmet * 100 + 0.001, 0)))]) + "\n")
    print("wrote {}".format(wfile))


if __name__ == "__main__":
    main()
