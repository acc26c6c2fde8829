#!/usr/bin/env python
"""Split a subreads/hifi BAM into two BAMs by a holeid list (selected / rest).

Capability parity with /root/reference/scripts/split_subreadsbam_by_holeids.py —
uses this engine's own BAM codec (no pysam/samtools).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsmeth_tpu.bamio import BamReader, BamWriter  # noqa: E402


def _get_holes(path):
    holes = set()
    with open(path) as rf:
        for line in rf:
            holes.add(line.strip().split("\t")[0])
    return holes


def _random_split(args):
    """Reference mode: shuffle hole ids with --seed; first round(n*ratio) holes
    land in part1 (split_subreadsbam_by_holeids.py)."""
    import random

    reader = BamReader(args.bam)
    holeids = set()
    for rec in reader:
        holeids.add(rec.qname.split("/")[1] if "/" in rec.qname else rec.qname)
    reader.close()
    ids = sorted(holeids)
    random.seed(args.seed)
    random.shuffle(ids)
    part1 = set(ids[: round(len(ids) * args.ratio)])
    prefix = args.out_prefix or os.path.splitext(os.path.abspath(args.bam))[0]
    out1 = prefix + ".part1_" + str(args.ratio) + ".bam"
    out2 = prefix + ".part2_" + str(1 - args.ratio) + ".bam"
    reader = BamReader(args.bam)
    w1 = BamWriter(out1, reader.header)
    w2 = BamWriter(out2, reader.header)
    n1 = n2 = 0
    for rec in reader:
        zmw = rec.qname.split("/")[1] if "/" in rec.qname else rec.qname
        if zmw in part1:
            w1.write(rec)
            n1 += 1
        else:
            w2.write(rec)
            n2 += 1
    w1.close(); w2.close(); reader.close()
    print("part1 {} reads -> {}, part2 {} reads -> {}".format(n1, out1, n2, out2))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bam", "-i", type=str, required=True)
    parser.add_argument("--holeids", type=str, default=None,
                        help="holeid list; omit to random-split by --ratio/--seed")
    parser.add_argument("--out_selected", type=str, default=None)
    parser.add_argument("--out_rest", type=str, default=None)
    parser.add_argument("--out_prefix", type=str, default=None)
    parser.add_argument("--ratio", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--path_to_samtools", type=str, default=None,
                        help="[IGNORED] BAM IO is first-party")
    args = parser.parse_args()

    if args.holeids is None:
        _random_split(args)
        return
    if args.out_selected is None:
        parser.error("--out_selected is required with --holeids")
    holes = _get_holes(args.holeids)
    reader = BamReader(args.bam)
    wsel = BamWriter(args.out_selected, reader.header)
    wrest = BamWriter(args.out_rest, reader.header) if args.out_rest else None
    n_sel = n_rest = 0
    for rec in reader:
        zmw = rec.qname.split("/")[1] if "/" in rec.qname else rec.qname
        if rec.qname in holes or zmw in holes:
            wsel.write(rec)
            n_sel += 1
        elif wrest is not None:
            wrest.write(rec)
            n_rest += 1
    wsel.close()
    if wrest is not None:
        wrest.close()
    reader.close()
    print("selected {} reads, rest {}".format(n_sel, n_rest))


if __name__ == "__main__":
    main()
