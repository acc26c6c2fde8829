#!/usr/bin/env python
"""Select rows from a feature file so its kmer distribution matches a reference
feature file's kmer ratios (balancing positive/negative training sets).

Capability parity with /root/reference/scripts/balance_samples_of_kmer_in_feature_file.py.
"""

import argparse
import math
import random

KMER_COLIDX = 5


def count_kmers(feafile):
    kmer_count = {}
    with open(feafile) as rf:
        for line in rf:
            kmer = line.split("\t", KMER_COLIDX + 1)[KMER_COLIDX]
            kmer_count[kmer] = kmer_count.get(kmer, 0) + 1
    return kmer_count


def kmer2lines(feafile):
    k2l = {}
    with open(feafile) as rf:
        for lcnt, line in enumerate(rf):
            kmer = line.split("\t", KMER_COLIDX + 1)[KMER_COLIDX]
            k2l.setdefault(kmer, []).append(lcnt)
    return k2l


def select_lines(k2l, kmer_ratios, totalline, random_frac, is_floor):
    selected, unselected = [], []
    for kmer in sorted(k2l.keys()):
        lines = k2l[kmer]
        if kmer in kmer_ratios:
            expect = kmer_ratios[kmer] * totalline * random_frac
            n = int(math.floor(expect)) if is_floor else int(round(expect))
            if n >= len(lines):
                selected.extend(lines)
            else:
                random.shuffle(lines)
                selected.extend(lines[:n])
                unselected.extend(lines[n:])
        else:
            unselected.extend(lines)
    return selected, unselected


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--feafile", type=str, required=True,
                        help="feature file to balance (rows are selected from it)")
    parser.add_argument("--kmer_feafile", type=str, required=True,
                        help="feature file whose kmer distribution is the target")
    parser.add_argument("--wfile", type=str, required=True)
    parser.add_argument("--random_frac", type=float, default=1.0,
                        help="scale factor on the target counts, default 1.0")
    parser.add_argument("--is_floor", "--floor", dest="is_floor",
                        action="store_true", default=False)
    parser.add_argument("--sel_linenum", type=int, default=None,
                        help="target number of selected rows "
                             "(reference interface; caps the output)")
    parser.add_argument("--fill", action="store_true", default=False,
                        help="top up with unselected rows to reach the target total")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    random.seed(args.seed)
    target_counts = count_kmers(args.kmer_feafile)
    total = sum(target_counts.values())
    ratios = {k: v / total for k, v in target_counts.items()}
    if args.sel_linenum is not None:
        # reference: --sel_linenum overrides the target total, ratios unchanged
        # (balance_samples_of_kmer_in_feature_file.py:145-146)
        total = args.sel_linenum
    k2l = kmer2lines(args.feafile)
    selected, unselected = select_lines(k2l, ratios, total, args.random_frac,
                                        args.is_floor)
    if args.fill and len(selected) < total:
        random.shuffle(unselected)
        selected.extend(unselected[: total - len(selected)])
    sel = set(selected)
    n = 0
    with open(args.feafile) as rf, open(args.wfile, "w") as wf:
        for lcnt, line in enumerate(rf):
            if lcnt in sel:
                wf.write(line)
                n += 1
    print("selected {} of {} rows -> {}".format(n, sum(len(v) for v in k2l.values()),
                                                args.wfile))


if __name__ == "__main__":
    main()
