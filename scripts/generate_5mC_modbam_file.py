#!/usr/bin/env python
"""Standalone per_readsite TSV + BAM -> modbam with MM/ML tags.

Capability parity with /root/reference/scripts/generate_5mC_modbam_file.py (and
ccsmeth/_bam2modbam.py): joins per-read calls from the TSV onto the BAM's reads
and rewrites MM/ML (pulse tags stripped unless --keep_pulse). The reference's
tabix-query-per-read plumbing is replaced by an in-memory read_name index.
"""

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsmeth_tpu.bamio import BamReader, BamWriter, sort_bam_in_memory  # noqa: E402
from ccsmeth_tpu.pipeline.modbam import add_mm_ml_to_record  # noqa: E402


def load_calls(per_readsite):
    """read_name -> [(loc, prob1)] with duplicate locs dropped (first kept)."""
    opener = gzip.open if per_readsite.endswith(".gz") else open
    calls = {}
    seen = {}
    with opener(per_readsite, "rt") as rf:
        for line in rf:
            w = line.strip().split("\t")
            holeid, loc, prob1 = w[3], int(w[4]), float(w[7])
            locs = seen.setdefault(holeid, set())
            if loc in locs:
                continue
            locs.add(loc)
            calls.setdefault(holeid, []).append((loc, prob1))
    return calls


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per_readsite", "-i", type=str, required=True)
    parser.add_argument("--bam", "-b", "--modbam", dest="bam", type=str,
                        required=True)
    parser.add_argument("--output", "-o", type=str, default=None)
    parser.add_argument("--rm_pulse", action="store_true", default=True)
    parser.add_argument("--keep_pulse", dest="rm_pulse", action="store_false")
    parser.add_argument("--no_sort", action="store_true", default=False)
    parser.add_argument("--mode", type=str, default="align",
                        choices=["align", "denovo"],
                        help="[compat] per_readsite coordinate space")
    parser.add_argument("--threads", type=int, default=1,
                        help="[compat] single linear pass here")
    parser.add_argument("--batch_size", type=int, default=100,
                        help="[compat] streaming here")
    args = parser.parse_args()

    calls = load_calls(args.per_readsite)
    fname, _ = os.path.splitext(args.bam)
    out = args.output or (fname + ".modbam.bam")
    reader = BamReader(args.bam)
    n = n_tagged = 0
    with BamWriter(out, reader.header) as w:
        for rec in reader:
            tagged = add_mm_ml_to_record(rec, calls.get(rec.qname, []),
                                         rm_pulse=args.rm_pulse)
            w.write(rec)
            n += 1
            n_tagged += int(tagged)
    reader.close()
    if not args.no_sort:
        tmp = os.path.splitext(out)[0] + ".sorted.bam"
        sort_bam_in_memory(out, tmp)
        os.replace(tmp, out)
    print("wrote {} reads ({} tagged) -> {}".format(n, n_tagged, out))


if __name__ == "__main__":
    main()
