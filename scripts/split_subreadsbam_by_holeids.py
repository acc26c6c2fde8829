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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bam", "-i", type=str, required=True)
    parser.add_argument("--holeids", type=str, required=True)
    parser.add_argument("--out_selected", type=str, required=True)
    parser.add_argument("--out_rest", type=str, default=None)
    args = parser.parse_args()

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
