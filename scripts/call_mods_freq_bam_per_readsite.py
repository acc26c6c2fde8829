#!/usr/bin/env python
"""modbam -> per-SITE rows carrying every read's mod prob (the input generator for
aggregate-model training). Capability parity with
/root/reference/scripts/call_mods_freq_bam.per_readsite.py, built on this engine's
linear-scan accumulator.

Output row: chrom, pos, strand, coverage, comma-joined per-read probs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsmeth_tpu.pipeline.call_freq_bam import (  # noqa: E402
    FreqBamConfig,
    scan_bam_accumulate,
)
from ccsmeth_tpu.utils.codecs import get_motif_seqs  # noqa: E402
from ccsmeth_tpu.utils.fasta import DNAReference  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_bam", "-i", type=str, required=True)
    parser.add_argument("--ref", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--motifs", type=str, default="CG")
    parser.add_argument("--mod_loc", type=int, default=0)
    parser.add_argument("--mapq", type=int, default=1)
    parser.add_argument("--identity", type=float, default=0.0)
    parser.add_argument("--no_supplementary", action="store_true", default=False)
    parser.add_argument("--no_comb", action="store_true", default=False)
    parser.add_argument("--hap_tag", type=str, default="HP")
    args = parser.parse_args()

    cfg = FreqBamConfig(
        input_bam=args.input_bam, ref=args.ref, output=args.output,
        motifs=args.motifs, mod_loc=args.mod_loc, mapq=args.mapq,
        identity=args.identity, no_supplementary=args.no_supplementary,
        no_comb=args.no_comb, hap_tag=args.hap_tag)
    dnacontigs = DNAReference(args.ref).getcontigs()
    accs = scan_bam_accumulate(cfg, dnacontigs, None)
    n = 0
    with open(args.output, "w") as wf:
        for contig in sorted(accs.keys()):
            acc = accs[contig]
            fwd = dict(acc.fwd)
            rev = dict(acc.rev)
            if args.motifs == "CG" and not args.no_comb:
                for rpos, vals in rev.items():
                    if rpos == 0:
                        continue
                    fwd.setdefault(rpos - 1, []).extend(vals)
                rev = {}
            for strand, table in (("+", fwd), ("-", rev)):
                for pos in sorted(table.keys()):
                    probs = [p for p, _hap in table[pos]]
                    wf.write("\t".join([
                        contig, str(pos), strand, str(len(probs)),
                        ",".join("{:.6f}".format(p) for p in probs)]) + "\n")
                    n += 1
    print("wrote {} sites -> {}".format(n, args.output))


if __name__ == "__main__":
    main()
