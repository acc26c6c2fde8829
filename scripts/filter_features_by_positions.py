#!/usr/bin/env python
"""Keep feature rows whose (chrom, pos) is in a position file, relabeling them.

Capability parity with /root/reference/scripts/filter_features_by_positions.py.
"""

import argparse
import os


def read_position_file(path, col_chrom=0, col_pos=1, header=False):
    poss = set()
    with open(path) as rf:
        if header:
            next(rf)
        for line in rf:
            w = line.strip().split("\t")
            poss.add(" ".join([w[col_chrom], w[col_pos]]))
    return poss


def filter_file(sf_fp, positions, wfp, label, chrom_col=1, pos_col=2, append=False):
    n = 0
    with open(sf_fp) as rf, open(wfp, "a" if append else "w") as wf:
        for line in rf:
            w = line.strip().split("\t")
            key = " ".join([w[chrom_col - 1], str(int(w[pos_col - 1]))])
            if key in positions:
                wf.write("\t".join(w[:-1] + [label]) + "\n")
                n += 1
    return n


def main():
    parser = argparse.ArgumentParser(
        description="extract feature rows at interested reference positions")
    parser.add_argument("--sf_path", type=str, required=True,
                        help="feature file, or a directory of them")
    parser.add_argument("--unique_fid", type=str, default=".tsv")
    parser.add_argument("-p", "--pos_fp", type=str, required=True,
                        help="position file: chromosome<TAB>pos per line")
    parser.add_argument("--midfix", type=str, default="filtered")
    parser.add_argument("--label", type=str, default="1", choices=["0", "1"])
    parser.add_argument("--chrom_col", type=int, default=1)
    parser.add_argument("--pos_col", type=int, default=2)
    parser.add_argument("--header", action="store_true", default=False)
    args = parser.parse_args()

    positions = read_position_file(args.pos_fp, header=args.header)
    print("read {} positions".format(len(positions)))
    if os.path.isdir(args.sf_path):
        files = [os.path.join(args.sf_path, f) for f in sorted(os.listdir(args.sf_path))
                 if args.unique_fid in f]
    else:
        files = [args.sf_path]
    for f in files:
        fname, fext = os.path.splitext(f)
        wfp = "{}.{}{}".format(fname, args.midfix, fext)
        n = filter_file(f, positions, wfp, args.label, args.chrom_col, args.pos_col)
        print("{} -> {} ({} rows)".format(f, wfp, n))


if __name__ == "__main__":
    main()
