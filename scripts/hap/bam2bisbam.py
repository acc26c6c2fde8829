#!/usr/bin/env python
"""Convert a haplotagged BAM + per-hap methylation calls into bisulfite-like BAMs
for IGV browsing.

Reference semantics (/root/reference/scripts/hap/bam2bisbam.py:201-234,343-553):
each read is REWRITTEN ONTO THE REFERENCE — the output record carries the
reference span [start, end) as its sequence with an all-M cigar and '*' qual;
every CpG site in the span becomes:

  - kept 'C' (or 'G' at the +1 base for '-'-strand reads) when the read's call
    at that site is methylated,
  - 'T' (or 'A') when called unmethylated,
  - 'N' when the read has no call there.

A read lands in the hp1/hp2 output according to WHICH call file contains it
(not the HP tag); an HP:i tag is added. Calls come straight from per_readsite
TSVs (ccsmeth layout: readid col 3, prob0/prob1 cols 6/7; --ont switches to the
nanopore layout readid col 4, no '/ccs' suffix handling, strand-matched) with
per-site dedup keeping the max-|llr| call. No tabix/samtools intermediates —
built on this engine's BAM codec.
"""

import argparse
import gzip
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from ccsmeth_tpu.bamio import BamReader, BamWriter, sort_bam_in_memory  # noqa: E402
from ccsmeth_tpu.utils.fasta import DNAReference  # noqa: E402


def load_calls(per_readsite, callthresh=0.0, isont=False):
    """read_id -> {refpos: llr} (llr>0 methylated), dedup by max |llr|."""
    rid_i, pos_i, strand_i, p0_i, p1_i = (
        (4, 1, 2, 6, 7) if isont else (3, 1, 2, 6, 7))
    calls: dict = {}
    strands: dict = {}
    opener = gzip.open if per_readsite.endswith(".gz") else open
    with opener(per_readsite, "rt") as rf:
        for line in rf:
            w = line.rstrip("\n").split("\t")
            if len(w) <= max(rid_i, p1_i):
                continue
            p0, p1 = float(w[p0_i]), float(w[p1_i])
            if abs(p1 - p0) < callthresh:
                continue
            rid = w[rid_i]
            llr = math.log((p1 + 1e-12) / (p0 + 1e-12))
            pos = int(w[pos_i])
            d = calls.setdefault(rid, {})
            if pos not in d or abs(llr) > abs(d[pos]):
                d[pos] = llr
            strands[rid] = w[strand_i]
    return calls, strands


def read2bis(refspan: str, is_reverse: bool, readcalls: dict, start: int) -> str:
    """Reference-span conversion (read2bis, bam2bisbam.py:201-234)."""
    offset = 1 if is_reverse else 0
    unmodified = "A" if is_reverse else "T"
    seq = np.frombuffer(refspan.encode(), dtype=np.uint8).copy()
    L = len(seq)
    meth_offs = set()
    unmeth_offs = set()
    for pos, llr in readcalls.items():
        off = pos - start
        if 0 <= off < L:
            (meth_offs if llr > 0 else unmeth_offs).add(off)
    for m in re.finditer("CG", refspan):
        site = m.start()
        tgt = site + offset
        if tgt >= L:
            continue
        if site in meth_offs:
            continue  # methylated: keep reference base
        seq[tgt] = ord(unmodified) if site in unmeth_offs else ord("N")
    return seq.tobytes().decode()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--haped_bam", type=str, required=True,
                        help="haplotagged (whatshap) BAM")
    parser.add_argument("--haped_tsv1", type=str, required=True,
                        help="per_readsite calls of hp1")
    parser.add_argument("--haped_tsv2", type=str, required=True,
                        help="per_readsite calls of hp2")
    parser.add_argument("--ref", type=str, required=True)
    parser.add_argument("--outprefix", type=str, required=True)
    parser.add_argument("--region", type=str, default=None,
                        help="chrom:start-end restriction")
    parser.add_argument("--ont", action="store_true", default=False,
                        help="nanopore per_readsite column layout")
    parser.add_argument("--callthresh", type=float, default=0.0)
    parser.add_argument("--no_sort", action="store_true", default=False)
    args = parser.parse_args()

    dnacontigs = DNAReference(args.ref).getcontigs()
    region = None
    if args.region:
        chrom, rng = args.region.split(":")
        lo, hi = rng.split("-")
        region = (chrom, int(lo), int(hi))

    hp_calls = []
    for tsv in (args.haped_tsv1, args.haped_tsv2):
        hp_calls.append(load_calls(tsv, args.callthresh, args.ont))

    reader = BamReader(args.haped_bam)
    refnames = [r[0] for r in reader.header.references]
    if region is None:
        outs = [args.outprefix + ".hp1bis.bam", args.outprefix + ".hp2bis.bam"]
    else:
        outs = [args.outprefix + ".hp{}bis_{}_{}.bam".format(h, region[0], region[1])
                for h in (1, 2)]
    writers = [BamWriter(p, reader.header) for p in outs]
    counts = [0, 0]
    for rec in reader:
        if (rec.is_unmapped or rec.is_secondary or rec.is_supplementary
                or rec.is_duplicate or rec.ref_id < 0):
            continue
        contig = refnames[rec.ref_id]
        if contig not in dnacontigs:
            continue
        start, end = rec.pos, rec.reference_end
        if region is not None and not (contig == region[0]
                                       and start < region[2] and end > region[1]):
            continue
        rid_ccs = rec.qname if args.ont else (
            rec.qname if rec.qname.endswith("/ccs") else rec.qname + "/ccs")
        rid_plain = rec.qname[:-4] if rec.qname.endswith("/ccs") else rec.qname
        strand = "-" if rec.is_reverse else "+"
        for hp, (calls, strands) in enumerate(hp_calls):
            rc = calls.get(rid_ccs) or calls.get(rid_plain) or calls.get(rec.qname)
            if not rc:
                continue
            if args.ont and strands.get(rec.qname) not in (None, strand):
                continue
            refspan = dnacontigs[contig][start:end]
            bis = read2bis(refspan, rec.is_reverse, rc, start)
            out = type(rec)(
                qname=rec.qname, flag=rec.flag, ref_id=rec.ref_id, pos=start,
                mapq=rec.mapq, cigar=[(0, len(bis))], seq=bis, qual=None,
                tags=[("HP", "i", hp + 1)] + [t for t in rec.tags
                                              if t[0] != "HP"])
            writers[hp].write(out)
            counts[hp] += 1
    reader.close()
    for w in writers:
        w.close()
    for hp, p in enumerate(outs):
        if not args.no_sort and counts[hp] > 0:
            tmp = p + ".sorted"
            sort_bam_in_memory(p, tmp)
            os.replace(tmp, p)
        print("hp{}: wrote {} bis reads -> {}".format(hp + 1, counts[hp], p))


if __name__ == "__main__":
    main()
