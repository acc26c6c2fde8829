#!/usr/bin/env python
"""Dump the intersected per-site data table of two frequency files (the rows
behind correlation_with_any.py's statistics). Capability parity with
/root/reference/scripts/correlation_with_any.data.py.
"""

import argparse

from correlation_with_any import _read_any


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--file_a", "--targetfile", dest="file_a", type=str,
                        required=True)
    parser.add_argument("--file_b", "--queryfile", dest="file_b", type=str,
                        required=True)
    parser.add_argument("--output", "-o", "--wfile", dest="output", type=str,
                        required=True)
    parser.add_argument("--contig_prefix", type=str, default=None)
    parser.add_argument("--contig_names", type=str, default=None)
    parser.add_argument("--cov_cf_a", "--covcf_t", dest="cov_cf_a", type=int,
                        default=5)
    parser.add_argument("--cov_cf_b", "--covcf", dest="cov_cf_b", type=int,
                        default=5)
    args = parser.parse_args()

    a = _read_any(args.file_a, args.contig_prefix, args.contig_names, args.cov_cf_a)
    b = _read_any(args.file_b, args.contig_prefix, args.contig_names, args.cov_cf_b)
    bmap = {k: (c, r) for k, c, r in zip(b["key"], b["coverage"], b["Rmet"])}
    n = 0
    with open(args.output, "w") as wf:
        wf.write("chromosome\tpos\tcov_a\trmet_a\tcov_b\trmet_b\n")
        for _idx, row in a.drop_duplicates("key").iterrows():
            if row["key"] in bmap:
                cb, rb = bmap[row["key"]]
                wf.write("\t".join([str(row["chromosome"]), str(row["pos"]),
                                    str(row["coverage"]), str(row["Rmet"]),
                                    str(cb), str(rb)]) + "\n")
                n += 1
    print("wrote {} intersected sites -> {}".format(n, args.output))


if __name__ == "__main__":
    main()
