#!/usr/bin/env python
"""per_readsite TSV -> per-READ call bed: one row per read with its sorted mod
locations and probs. Capability parity with
/root/reference/scripts/generate_per_read_modscall.py (the tabix step is replaced
by this engine's BGZF compressor; coordinate-sort is done in-process).
"""

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_per_read_calls(per_readsite, output):
    opener = gzip.open if per_readsite.endswith(".gz") else open
    rows = []
    holeid_curr = ""
    info = []
    cur_locs = set()

    def flush():
        if not info:
            return
        info.sort(key=lambda x: x[0])
        locs = [x[0] for x in info]
        probs = [x[1] for x in info]
        rows.append("\t".join([holeid_curr, str(locs[0]), str(locs[-1] + 1),
                               str(len(locs)), ",".join(map(str, locs)),
                               ",".join(map(str, probs))]))

    with opener(per_readsite, "rt") as rf:
        for line in rf:
            w = line.strip().split("\t")
            holeid, loc, prob_1 = w[3], int(w[4]), float(w[7])
            if holeid != holeid_curr:
                flush()
                info = []
                cur_locs = set()
                holeid_curr = holeid
            if loc not in cur_locs:
                cur_locs.add(loc)
                info.append((loc, prob_1))
        flush()
    rows.sort(key=lambda r: r.split("\t")[0])
    with open(output, "w") as wf:
        wf.write("\n".join(rows) + ("\n" if rows else ""))
    return output


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per_readsite", "-i", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, default=None)
    parser.add_argument("--gzip", action="store_true", default=False,
                        help="bgzip the output")
    args = parser.parse_args()

    fname, _ = os.path.splitext(args.per_readsite)
    wfile = args.output or (fname + ".per_read.bed")
    if wfile.endswith(".gz"):
        wfile = wfile[:-3]
    generate_per_read_calls(args.per_readsite, wfile)
    if args.gzip:
        from ccsmeth_tpu.bamio.bgzf import BgzfWriter

        with open(wfile, "rb") as rf, BgzfWriter(wfile + ".gz") as w:
            w.write(rf.read())
        os.remove(wfile)
        wfile += ".gz"
    print("wrote {}".format(wfile))


if __name__ == "__main__":
    main()
