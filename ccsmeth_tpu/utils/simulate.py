"""Synthetic HiFi-like data simulator (first-party; used by tests, the benchmark,
and examples/run_demo.py).

Simulates what `ccs --hifi-kinetics` + alignment produce: reads carrying fi/ri/fp/rp
(uint8 CodecV1-coded kinetics), fn/rn (pass counts), sn (4 floats) tags, optionally
aligned to a random reference contig.
"""

from __future__ import annotations

import numpy as np

from ..bamio import BamHeader, BamRecord, BamWriter
from .codecs import complement_seq

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng: np.random.RandomState, n: int, cg_boost: float = 0.08) -> str:
    """Random DNA with extra CG dinucleotides so CpG sites are plentiful."""
    arr = BASES[rng.randint(0, 4, size=n)].copy()
    n_cg = int(n * cg_boost / 2)
    pos = rng.choice(np.arange(0, n - 1, 2), size=min(n_cg, n // 2 - 1), replace=False)
    arr[pos] = ord("C")
    arr[pos + 1] = ord("G")
    return arr.tobytes().decode("ascii")


def make_read(rng: np.random.RandomState, seq: str, qname: str, flag: int = 4,
              ref_id: int = -1, pos: int = -1, mapq: int = 60,
              cigar=None) -> BamRecord:
    n = len(seq)
    rec = BamRecord(
        qname=qname, flag=flag, ref_id=ref_id, pos=pos, mapq=mapq,
        cigar=cigar if cigar is not None else ([(0, n)] if ref_id >= 0 else []),
        seq=seq, qual=np.full(n, 40, dtype=np.uint8),
    )
    rec.tags = [
        ("fi", "BC", rng.randint(0, 256, size=n).astype(np.uint8)),
        ("ri", "BC", rng.randint(0, 256, size=n).astype(np.uint8)),
        ("fp", "BC", rng.randint(0, 256, size=n).astype(np.uint8)),
        ("rp", "BC", rng.randint(0, 256, size=n).astype(np.uint8)),
        ("fn", "i", int(rng.randint(3, 25))),
        ("rn", "i", int(rng.randint(3, 25))),
        ("sn", "Bf", rng.uniform(2, 12, size=4).astype(np.float32)),
        ("np", "i", int(rng.randint(3, 25))),
        ("rq", "f", 0.999),
    ]
    return rec


def make_synth_bam(path: str, n_reads: int = 20, read_len: int = 400, seed: int = 7,
                   aligned: bool = True, ref_len: int = 5000,
                   ref_name: str = "chrS") -> tuple[str, str]:
    """Write a synthetic (aligned, sorted) hifi BAM; returns (fasta_str, sam_header_text).

    Aligned reads are exact substrings of the reference (cigar all-M), half reverse
    strand (the stored seq is then the reverse complement of the forward read seq,
    and kinetics tags follow the HiFi convention: fi/fp along the forward read,
    ri/rp along its reverse complement).
    """
    rng = np.random.RandomState(seed)
    refseq = random_seq(rng, ref_len)
    header = BamHeader(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{}\tLN:{}\n".format(ref_name, ref_len),
        [(ref_name, ref_len)],
    )
    starts = np.sort(rng.randint(0, ref_len - read_len, size=n_reads))
    with BamWriter(path, header) as w:
        for i, s in enumerate(starts):
            sub = refseq[s : s + read_len]
            is_rev = bool(i % 2) and aligned
            if aligned:
                stored = complement_seq(sub) if is_rev else sub
                flag = 16 if is_rev else 0
                rec = make_read(rng, stored, "m0/{}/ccs".format(i), flag=flag,
                                ref_id=0, pos=int(s))
            else:
                rec = make_read(rng, sub, "m0/{}/ccs".format(i))
            w.write(rec)
    return refseq, header.text


def write_fasta(path: str, contigs: dict[str, str], width: int = 60) -> None:
    with open(path, "w") as f:
        for name, seq in contigs.items():
            f.write(">{}\n".format(name))
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")
