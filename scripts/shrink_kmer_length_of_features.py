#!/usr/bin/env python
"""Center-truncate every kmer-length column of a feature TSV to a shorter odd k.

Capability parity with /root/reference/scripts/shrink_kmer_length_of_features.py:
columns 6..(last-1) that have the original kmer length (as comma vector or string)
are cut symmetrically.
"""

import argparse
import os


def shrink(infile, klen, output=None):
    if klen % 2 == 0:
        raise ValueError("--klen is not odd")
    fname, fext = os.path.splitext(infile)
    wfile = output if output is not None else "{}.{}{}".format(fname, klen, fext)
    with open(infile) as rf, open(wfile, "w") as wf:
        oriklen = None
        left = right = None
        for line in rf:
            words = line.strip().split("\t")
            if oriklen is None:
                oriklen = len(words[5])
                if oriklen <= klen:
                    raise ValueError(
                        "--klen equals/greats kmer-length in the file, "
                        "ori-klen:{}".format(oriklen))
                left = (oriklen - klen) // 2
                right = oriklen - klen - left
            for widx in range(5, len(words) - 1):
                parts = words[widx].split(",")
                if len(parts) == oriklen:
                    words[widx] = ",".join(parts[left:-right])
                elif len(words[widx]) == oriklen:
                    words[widx] = words[widx][left:-right]
            wf.write("\t".join(words) + "\n")
    return wfile


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", type=str, required=True)
    parser.add_argument("--klen", type=int, required=True)
    parser.add_argument("--output", "-o", type=str, default=None)
    args = parser.parse_args()
    print("wrote {}".format(shrink(args.input, args.klen, args.output)))


if __name__ == "__main__":
    main()
