#!/usr/bin/env python
"""Shuffle a feature file and split it into train/valid files.

Capability parity with /root/reference/scripts/generate_train_valid_files.py.
"""

import argparse
import os
import random


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--feature_file", type=str, required=True, action="append",
                        help="feature TSV; repeatable (files are concatenated)")
    parser.add_argument("--wprefix", type=str, required=True,
                        help="output prefix -> [wprefix].train.tsv/.valid.tsv")
    parser.add_argument("--valid_ratio", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    random.seed(args.seed)
    lines = []
    for f in args.feature_file:
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
