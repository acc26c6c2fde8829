#!/usr/bin/env python
"""Filter feature rows by mean pass depth (columns 7/15 of the feature TSV).

Capability parity with /root/reference/scripts/filter_features_by_depth.py (which
reads the fwd npass column; here both strands' npass are averaged the same way:
mean of the comma-joined depth field).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser("filter features by depth")
    parser.add_argument("--input", "-i", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--depth", type=int, default=1, help="depth cutoff, default 1")
    parser.add_argument("--depth_col", type=int, default=7,
                        help="1-based column holding depth value(s), default 7 "
                             "(fwd npass of a feature TSV)")
    args = parser.parse_args()

    n_in = n_out = 0
    with open(args.input) as rf, open(args.output, "w") as wf:
        for line in rf:
            n_in += 1
            field = line.split("\t")[args.depth_col - 1]
            depths = [int(x) for x in field.split(",")]
            if args.depth <= np.mean(depths):
                wf.write(line)
                n_out += 1
    print("kept {}/{} rows -> {}".format(n_out, n_in, args.output))


if __name__ == "__main__":
    main()
