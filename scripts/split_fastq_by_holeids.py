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


def _random_split(args):
    """Reference mode (split_fastq_by_holeids.py:30-75): shuffle the fastq's hole
    ids with --seed, route the first round(n*ratio) holes to part1."""
    import os
    import random

    opener = gzip.open if args.fastq.endswith(".gz") else open
    holeids = set()
    with opener(args.fastq, "rt") as rf:
        while True:
            block = [rf.readline() for _ in range(4)]
            if not block[0]:
                break
            name = block[0][1:].split()[0]
            holeids.add(name.split("/")[1] if "/" in name else name)
    ids = sorted(holeids)
    random.seed(args.seed)
    random.shuffle(ids)
    n1 = round(len(ids) * args.ratio)
    part1 = set(ids[:n1])
    prefix = args.out_prefix or os.path.splitext(os.path.abspath(args.fastq))[0]
    out1 = prefix + ".part1_" + str(args.ratio) + ".fq"
    out2 = prefix + ".part2_" + str(1 - args.ratio) + ".fq"
    n_sel = n_rest = 0
    with opener(args.fastq, "rt") as rf, open(out1, "w") as w1, open(out2, "w") as w2:
        while True:
            block = [rf.readline() for _ in range(4)]
            if not block[0]:
                break
            name = block[0][1:].split()[0]
            zmw = name.split("/")[1] if "/" in name else name
            if zmw in part1:
                w1.writelines(block)
                n_sel += 1
            else:
                w2.writelines(block)
                n_rest += 1
    print("part1 {} reads -> {}, part2 {} reads -> {}".format(n_sel, out1,
                                                              n_rest, out2))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fastq", "-i", type=str, required=True)
    parser.add_argument("--holeids", type=str, default=None,
                        help="file of holeids (zmw numbers or full read names); "
                             "omit to random-split by --ratio/--seed instead")
    parser.add_argument("--out_selected", type=str, default=None)
    parser.add_argument("--out_rest", type=str, default=None)
    parser.add_argument("--out_prefix", type=str, default=None,
                        help="(random-split mode) output prefix")
    parser.add_argument("--ratio", type=float, default=0.5,
                        help="(random-split mode) fraction of holes in part1")
    parser.add_argument("--seed", type=int, default=111)
    args = parser.parse_args()

    if args.holeids is None:
        _random_split(args)
        return
    if args.out_selected is None:
        parser.error("--out_selected is required with --holeids")
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
