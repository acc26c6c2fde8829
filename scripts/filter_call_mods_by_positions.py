#!/usr/bin/env python
"""Keep per_readsite call_mods rows at interested reference positions.

Capability parity with /root/reference/scripts/filter_call_mods_by_positions.py.
"""

import argparse
import gzip


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", "--cm_path", dest="input", type=str, required=True,
                        help="per_readsite tsv(.gz)")
    parser.add_argument("--pos_fp", "-p", type=str, required=True,
                        help="position file: chrom<TAB>pos per line")
    parser.add_argument("--output", "-o", "--wfile", dest="output", type=str, required=True)
    parser.add_argument("--header", action="store_true", default=False,
                        help="position file has a header line")
    args = parser.parse_args()

    poss = set()
    with open(args.pos_fp) as rf:
        if args.header:
            next(rf)
        for line in rf:
            w = line.strip().split("\t")
            poss.add((w[0], int(w[1])))
    opener = gzip.open if args.input.endswith(".gz") else open
    n_in = n_out = 0
    with opener(args.input, "rt") as rf, open(args.output, "w") as wf:
        for line in rf:
            n_in += 1
            w = line.split("\t", 3)
            if (w[0], int(w[1])) in poss:
                wf.write(line)
                n_out += 1
    print("kept {}/{} rows -> {}".format(n_out, n_in, args.output))


if __name__ == "__main__":
    main()
