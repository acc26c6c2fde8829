#!/usr/bin/env python
"""Convert a haplotagged modbam + per-hap methylation calls into bisulfite-like
BAMs for IGV browsing: on each read, called-unmethylated Cs are rewritten to T
(fwd strand; G->A on reverse), methylated Cs kept — mimicking what a bisulfite
alignment would look like.

Capability parity with /root/reference/scripts/hap/bam2bisbam.py, built on this
engine's own BAM codec (no samtools pipes, no tabix temp files).
"""

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from ccsmeth_tpu.bamio import BamReader, BamWriter, sort_bam_in_memory  # noqa: E402


def load_calls(per_readsite, callthresh=0.0):
    """read -> {read_loc: called_label}."""
    calls = {}
    opener = gzip.open if per_readsite.endswith(".gz") else open
    with opener(per_readsite, "rt") as rf:
        for line in rf:
            w = line.strip().split("\t")
            readid, loc = w[3], int(w[4])
            prob0, prob1 = float(w[6]), float(w[7])
            if abs(prob0 - prob1) < callthresh:
                continue
            if readid.endswith("/ccs"):
                readid = readid[:-4]
            calls.setdefault(readid, {})[loc] = 1 if prob1 > prob0 else 0
    return calls


def bisulfite_convert(rec, readcalls):
    """Rewrite the stored sequence bisulfite-style based on per-read calls.

    Calls are in FORWARD-read coordinates; unmethylated C -> T on the forward
    sequence (so on a reverse-stranded record the stored base flips G -> A)."""
    L = len(rec.seq)
    seq = np.frombuffer(rec.seq.encode(), dtype=np.uint8).copy()
    for loc, label in readcalls.items():
        if label == 1:
            continue  # methylated: keep C
        if rec.is_reverse:
            p = L - 1 - loc
            if 0 <= p < L and seq[p] == ord("G"):
                seq[p] = ord("A")
        else:
            if 0 <= loc < L and seq[loc] == ord("C"):
                seq[loc] = ord("T")
    rec.seq = seq.tobytes().decode()
    return rec


def convert_one(bam, calls, out_bam, hap, hap_tag="HP"):
    reader = BamReader(bam)
    n = n_conv = 0
    with BamWriter(out_bam, reader.header) as w:
        for rec in reader:
            if hap is not None:
                try:
                    if int(rec.get_tag(hap_tag)) != hap:
                        continue
                except (KeyError, ValueError):
                    continue
            readid = rec.qname[:-4] if rec.qname.endswith("/ccs") else rec.qname
            rc = calls.get(readid)
            if rc:
                bisulfite_convert(rec, rc)
                n_conv += 1
            w.write(rec)
            n += 1
    reader.close()
    return n, n_conv


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--haped_bam", type=str, required=True,
                        help="haplotagged (whatshap) BAM")
    parser.add_argument("--haped_tsv1", type=str, required=True,
                        help="per_readsite calls of hp1")
    parser.add_argument("--haped_tsv2", type=str, required=True,
                        help="per_readsite calls of hp2")
    parser.add_argument("--outprefix", type=str, required=True)
    parser.add_argument("--hap_tag", type=str, default="HP")
    parser.add_argument("--callthresh", type=float, default=0.0)
    parser.add_argument("--no_sort", action="store_true", default=False)
    args = parser.parse_args()

    for hap, tsv in ((1, args.haped_tsv1), (2, args.haped_tsv2)):
        calls = load_calls(tsv, args.callthresh)
        out = "{}.hp{}.bis.bam".format(args.outprefix, hap)
        n, n_conv = convert_one(args.haped_bam, calls, out, hap, args.hap_tag)
        if not args.no_sort and n > 0:
            tmp = out + ".sorted"
            sort_bam_in_memory(out, tmp)
            os.replace(tmp, out)
        print("hp{}: wrote {} reads ({} converted) -> {}".format(hap, n, n_conv, out))


if __name__ == "__main__":
    main()
