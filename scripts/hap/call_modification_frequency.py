#!/usr/bin/env python
"""Per-haplotype modification frequency from (phased) per_readsite files.

Capability parity with /root/reference/scripts/hap/call_modification_frequency.py —
a thin wrapper over this engine's call_freqt aggregation run once per haplotype
split file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ccsmeth_tpu.pipeline.call_freq_txt import (  # noqa: E402
    calculate_mods_frequency,
    write_sitekey2stats,
)


def main():
    parser = argparse.ArgumentParser(
        description="calculate per-haplotype modification frequency")
    parser.add_argument("--input_path", "-i", action="append", type=str,
                        required=True, help="phased per_readsite tsv; repeatable "
                                            "(e.g. -i calls.hp1.tsv -i calls.hp2.tsv)")
    parser.add_argument("--result_prefix", "-o", "--result_file",
                        dest="result_prefix", type=str, required=True)
    parser.add_argument("--file_uid", type=str, default=None,
                        help="only use input files whose name contains this uid")
    parser.add_argument("--prob_cf", type=float, default=0.0)
    parser.add_argument("--rm_1strand", action="store_true", default=False)
    parser.add_argument("--bed", action="store_true", default=False)
    parser.add_argument("--sort", action="store_true", default=False)
    parser.add_argument("--gzip", action="store_true", default=False)
    args = parser.parse_args()
    # reference interface: an --input_path may be a directory; --file_uid filters
    resolved = []
    for ip in args.input_path:
        if os.path.isdir(ip):
            resolved.extend(sorted(
                os.path.join(ip, f) for f in os.listdir(ip)
                if os.path.isfile(os.path.join(ip, f))
                and (args.file_uid is None or args.file_uid in f)))
        elif args.file_uid is None or args.file_uid in os.path.basename(ip):
            resolved.append(ip)
    if not resolved:
        parser.error("no input files after --file_uid filtering")
    args.input_path = resolved

    for path in args.input_path:
        base = os.path.basename(path)
        for tag in (".hp1", ".hp2", ".unphased"):
            if tag in base:
                suffix = tag
                break
        else:
            suffix = ""
        stats = calculate_mods_frequency([path], args.prob_cf, args.rm_1strand)
        out = args.result_prefix + suffix + (".bed" if args.bed else ".freq.txt")
        written = write_sitekey2stats(stats, out, args.sort, args.bed, args.gzip)
        print("{} -> {} ({} sites)".format(path, written, len(stats)))


if __name__ == "__main__":
    main()
