#!/usr/bin/env python
"""Interleaved shuffle-merge of two feature files (e.g. positive/negative samples).

Capability parity with /root/reference/scripts/concat_two_files.py (and
process_utils.py:364-396): reads proportional chunks of both files, shuffles each
merged chunk, appends to the output — memory stays bounded for huge files.
"""

import argparse
import random


def count_lines(path, header=False):
    n = 0
    with open(path) as rf:
        if header:
            next(rf)
        for _ in rf:
            n += 1
    return n


def concat_two_files(file1, file2, concated_fp, shuffle_lines_num=2000000,
                     isheader=False, seed=1234, num_samples_per_file=None):
    random.seed(seed)
    with open(concated_fp, "w") as wf:
        if isheader:
            with open(file1) as rf1:
                wf.write(next(rf1))
    n1 = count_lines(file1, isheader)
    n2 = count_lines(file2, False)
    if num_samples_per_file is not None:
        n1 = min(n1, num_samples_per_file)
        n2 = min(n2, num_samples_per_file)
    ratio = float(n2) / n1 if n1 else 1.0
    chunk2 = int(round(ratio * shuffle_lines_num)) + 1
    rf1 = open(file1)
    rf2 = open(file2)
    if isheader:
        next(rf1)
    done1 = done2 = False
    left1, left2 = n1, n2
    with open(concated_fp, "a") as wf:
        while not (done1 and done2):
            chunk = []
            for _ in range(min(shuffle_lines_num, max(left1, 0))):
                line = rf1.readline()
                if not line:
                    break
                chunk.append(line)
                left1 -= 1
            done1 = done1 or left1 <= 0
            for _ in range(min(chunk2, max(left2, 0))):
                line = rf2.readline()
                if not line:
                    break
                chunk.append(line)
                left2 -= 1
            done2 = done2 or left2 <= 0
            if not chunk:
                break
            random.shuffle(chunk)
            wf.writelines(chunk)
    rf1.close()
    rf2.close()
    print("done concating files to: {}".format(concated_fp))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp1", type=str, required=True)
    parser.add_argument("--fp2", type=str, required=True)
    parser.add_argument("--concated_fp", type=str, required=True)
    parser.add_argument("--shuffle_lines_num", "--num_lines_shuffle", dest="shuffle_lines_num", type=int, default=2000000)
    parser.add_argument("--isheader", action="store_true", default=False)
    parser.add_argument("--header", type=str, default=None,
                        help="yes/no (reference interface; same as --isheader)")
    parser.add_argument("--num_samples_per_file", type=int, default=None,
                        help="take at most N lines from each input "
                             "(reference interface)")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()
    isheader = args.isheader or (args.header or "no").lower() in ("yes", "true", "1")
    concat_two_files(args.fp1, args.fp2, args.concated_fp, args.shuffle_lines_num,
                     isheader, args.seed, args.num_samples_per_file)


if __name__ == "__main__":
    main()
