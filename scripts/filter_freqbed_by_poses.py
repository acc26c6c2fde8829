#!/usr/bin/env python
"""Keep bedMethyl/freq rows whose (chrom, pos) appears in a position file.

Capability parity with /root/reference/scripts/filter_freqbed_by_poses.py.
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", type=str, required=True,
                        help="bedMethyl or freq.txt file")
    parser.add_argument("--pos_fp", "-p", "--posfile", dest="pos_fp", type=str, required=True,
                        help="position file: chrom<TAB>pos per line")
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--chrom_col", type=int, default=1)
    parser.add_argument("--pos_col", type=int, default=2)
    args = parser.parse_args()

    poss = set()
    with open(args.pos_fp) as rf:
        for line in rf:
            w = line.strip().split("\t")
            poss.add((w[0], int(w[1])))
    n_in = n_out = 0
    with open(args.input) as rf, open(args.output, "w") as wf:
        for line in rf:
            n_in += 1
            w = line.strip().split("\t")
            if (w[args.chrom_col - 1], int(w[args.pos_col - 1])) in poss:
                wf.write(line)
                n_out += 1
    print("kept {}/{} rows -> {}".format(n_out, n_in, args.output))


if __name__ == "__main__":
    main()
