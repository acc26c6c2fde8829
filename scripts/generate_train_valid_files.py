#!/usr/bin/env python
"""Shuffle a feature file and split it into train/valid files.

Capability parity with /root/reference/scripts/generate_train_valid_files.py.
"""

import argparse
import os
import random


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--feature_file", type=str, default=None, action="append",
                        help="feature TSV; repeatable (files are concatenated)")
    parser.add_argument("--posfile", type=str, default=None,
                        help="positive-sample feature TSV (reference interface)")
    parser.add_argument("--negfile", type=str, default=None,
                        help="negative-sample feature TSV (reference interface)")
    parser.add_argument("--wprefix", type=str, required=True,
                        help="output prefix -> [wprefix].train.tsv/.valid.tsv")
    parser.add_argument("--train_ratio", type=float, default=None,
                        help="fraction routed to train (reference interface; "
                             "equivalent to 1 - valid_ratio)")
    parser.add_argument("--valid_ratio", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    files = list(args.feature_file or [])
    for f in (args.posfile, args.negfile):
        if f:
            files.append(f)
    if not files:
        parser.error("provide --feature_file or --posfile/--negfile")
    if args.train_ratio is not None:
        args.valid_ratio = 1.0 - args.train_ratio
    random.seed(args.seed)
    lines = []
    for f in files:
        with open(f) as rf:
            lines.extend(rf.readlines())
    random.shuffle(lines)
    n_valid = int(len(lines) * args.valid_ratio)
    train_f = args.wprefix + ".train.tsv"
    valid_f = args.wprefix + ".valid.tsv"
    with open(valid_f, "w") as wf:
        wf.writelines(lines[:n_valid])
    with open(train_f, "w") as wf:
        wf.writelines(lines[n_valid:])
    print("wrote {} train rows -> {}, {} valid rows -> {}".format(
        len(lines) - n_valid, train_f, n_valid, valid_f))
    for f in (train_f, valid_f):
        if os.path.getsize(f) == 0:
            print("WARNING: {} is empty".format(f))


if __name__ == "__main__":
    main()
