#!/usr/bin/env python
"""Split per_readsite methylation calls by haplotype (whatshap HP tags).

Capability parity with /root/reference/scripts/hap/phase_methyl_calls.py: reads
read->haplotype assignments from a haplotagged BAM (this engine's own reader — no
samtools pipe) or a readlist TSV, then splits the per_readsite TSV into
.hp1/.hp2/.unphased files.
"""

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ccsmeth_tpu.bamio import BamReader  # noqa: E402

CONTIGS = set(["chr" + str(i) for i in range(1, 23)] + ["chrX", "chrY"])


def haplotags_from_bam(bam, mapq=20, hap_tag="HP", all_contigs=False):
    read2hap = {}
    cnt_all = cnt_hap = 0
    reader = BamReader(bam)
    refnames = [r[0] for r in reader.header.references]
    for rec in reader:
        if rec.is_unmapped or rec.is_secondary or rec.is_supplementary:
            continue
        if rec.ref_id < 0:
            continue
        if not all_contigs and refnames[rec.ref_id] not in CONTIGS:
            continue
        if rec.mapq < mapq:
            continue
        cnt_all += 1
        readid = rec.qname
        if readid.endswith("/ccs"):
            readid = readid[:-4]
        try:
            hap = int(rec.get_tag(hap_tag))
            read2hap[readid] = hap
            cnt_hap += 1
        except (KeyError, ValueError):
            pass
    reader.close()
    print("reads analyzed: {}, haplotagged: {}".format(cnt_all, cnt_hap),
          file=sys.stderr)
    return read2hap


def haplotags_from_readlist(path):
    read2hap = {}
    with open(path) as rf:
        for line in rf:
            w = line.strip().split("\t")
            readid = w[0]
            if readid.endswith("/ccs"):
                readid = readid[:-4]
            hap = w[1]
            if hap in ("1", "H1", "hp1"):
                read2hap[readid] = 1
            elif hap in ("2", "H2", "hp2"):
                read2hap[readid] = 2
    return read2hap


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--methylcall", "-i", type=str, required=True,
                        help="per_readsite tsv(.gz)")
    parser.add_argument("--bam", type=str, default=None,
                        help="haplotagged BAM (whatshap output)")
    parser.add_argument("--readlist", type=str, default=None,
                        help="TSV: read_name<TAB>haplotype (1/2)")
    parser.add_argument("--mapq", type=int, default=20)
    parser.add_argument("--hap_tag", type=str, default="HP")
    parser.add_argument("--all_contigs", action="store_true", default=False)
    parser.add_argument("--id", type=str, default=None,
                        help="uid inserted into output filenames "
                             "(reference interface)")
    args = parser.parse_args()

    if args.bam is not None:
        read2hap = haplotags_from_bam(args.bam, args.mapq, args.hap_tag,
                                      args.all_contigs)
    elif args.readlist is not None:
        read2hap = haplotags_from_readlist(args.readlist)
    else:
        raise ValueError("provide --bam or --readlist")

    fname, fext = os.path.splitext(args.methylcall)
    if fext == ".gz":
        fname, fext = os.path.splitext(fname)
    uid = "." + args.id if args.id else ""
    outs = {1: open(fname + uid + ".hp1" + fext, "w"),
            2: open(fname + uid + ".hp2" + fext, "w"),
            0: open(fname + uid + ".unphased" + fext, "w")}
    opener = gzip.open if args.methylcall.endswith(".gz") else open
    counts = {0: 0, 1: 0, 2: 0}
    with opener(args.methylcall, "rt") as rf:
        for line in rf:
            readid = line.split("\t", 4)[3]
            if readid.endswith("/ccs"):
                readid = readid[:-4]
            hap = read2hap.get(readid, 0)
            outs[hap].write(line)
            counts[hap] += 1
    for f in outs.values():
        f.close()
    print("hp1: {} rows, hp2: {} rows, unphased: {} rows".format(
        counts[1], counts[2], counts[0]))


if __name__ == "__main__":
    main()
