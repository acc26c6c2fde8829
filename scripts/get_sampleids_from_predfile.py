#!/usr/bin/env python
"""Extract (chrom, pos, holeid) sample ids from a per_readsite prediction file for
read-level evaluation. Capability parity with
/root/reference/scripts/get_sampleids_from_predfile.py.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--idsrc", type=str, required=True)
    parser.add_argument("--one_strand", action="store_true", default=False,
                        help="don't also add the +1 position (CG partner site)")
    parser.add_argument("--rev_strand", action="store_true", default=False,
                        help="keep '-' strand positions as-is (no -1 shift)")
    args = parser.parse_args()

    fname, _ = os.path.splitext(args.idsrc)
    out = fname + ".sampleids.txt"
    with open(args.idsrc) as rf, open(out, "w") as wf:
        for line in rf:
            if line.startswith("#"):
                continue
            w = line.strip().split("\t")
            chrom, pos, strand, holeid = w[0], int(w[1]), w[2], w[3]
            holeid = holeid.split("/")[1] if "/" in holeid else holeid
            if strand == "-" and not args.rev_strand:
                pos -= 1
            wf.write("\t".join([chrom, str(pos), holeid]) + "\n")
            if not args.one_strand:
                wf.write("\t".join([chrom, str(pos + 1), holeid]) + "\n")
    print("wrote {}".format(out))


if __name__ == "__main__":
    main()
