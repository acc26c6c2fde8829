#!/usr/bin/env python
"""Randomly select N rows from a (possibly huge) text file via reservoir sampling.

Capability parity with /root/reference/scripts/randsel_file_rows.py.
"""

import argparse
import gzip
import random


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ori_filepath", type=str, required=True)
    parser.add_argument("--write_filepath", type=str, required=True)
    parser.add_argument("--num_lines", type=int, required=True)
    parser.add_argument("--header", action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    random.seed(args.seed)
    opener = gzip.open if args.ori_filepath.endswith(".gz") else open
    reservoir = []
    header = None
    with opener(args.ori_filepath, "rt") as rf:
        if args.header:
            header = next(rf)
        for i, line in enumerate(rf):
            if i < args.num_lines:
                reservoir.append(line)
            else:
                j = random.randint(0, i)
                if j < args.num_lines:
                    reservoir[j] = line
    with open(args.write_filepath, "w") as wf:
        if header is not None:
            wf.write(header)
        wf.writelines(reservoir)
    print("selected {} rows -> {}".format(len(reservoir), args.write_filepath))


if __name__ == "__main__":
    main()
