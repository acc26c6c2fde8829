#!/usr/bin/env python
"""Split a FASTQ into two files by a holeid list (selected / rest).

Capability parity with /root/reference/scripts/split_fastq_by_holeids.py.
"""

import argparse
import gzip


def _get_holes(path):
    holes = set()
    with open(path) as rf:
        for line in rf:
            holes.add(line.strip().split("\t")[0])
    return holes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fastq", "-i", type=str, required=True)
    parser.add_argument("--holeids", type=str, required=True,
                        help="file of holeids (zmw numbers or full read names)")
    parser.add_argument("--out_selected", type=str, required=True)
    parser.add_argument("--out_rest", type=str, default=None)
    args = parser.parse_args()

    holes = _get_holes(args.holeids)
    opener = gzip.open if args.fastq.endswith(".gz") else open
    n_sel = n_rest = 0
    wrest = open(args.out_rest, "w") if args.out_rest else None
    with opener(args.fastq, "rt") as rf, open(args.out_selected, "w") as wsel:
        while True:
            block = [rf.readline() for _ in range(4)]
            if not block[0]:
                break
            name = block[0][1:].split()[0].split("\t")[0]
            zmw = name.split("/")[1] if "/" in name else name
            if name in holes or zmw in holes:
                wsel.writelines(block)
                n_sel += 1
            elif wrest is not None:
                wrest.writelines(block)
                n_rest += 1
    if wrest is not None:
        wrest.close()
    print("selected {} reads, rest {}".format(n_sel, n_rest))


if __name__ == "__main__":
    main()
