#!/usr/bin/env python
"""Convert a (subreads/hifi) BAM to FASTQ keeping tags on the header line.

Capability parity with /root/reference/scripts/subreads_bam2fq.py and
utils/sam2fastq_std.py — uses this engine's own BAM reader (no samtools needed).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsmeth_tpu.wrappers.align_hifi import bam2fastq_stream  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", "--subreads", dest="input", type=str, required=True,
                        help="bam/sam input")
    parser.add_argument("--output", "-o", type=str, default=None,
                        help="fastq output; default stdout")
    args = parser.parse_args()
    out = open(args.output, "w") if args.output else sys.stdout
    n = bam2fastq_stream(args.input, out)
    if args.output:
        out.close()
    print("converted {} reads".format(n), file=sys.stderr)


if __name__ == "__main__":
    main()
