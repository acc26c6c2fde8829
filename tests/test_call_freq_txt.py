"""call_freqt parity vs the reference's own aggregation functions."""

import sys
import types

import numpy as np
import pytest

from ccsmeth_tpu.pipeline.call_freq_txt import (
    FreqTxtConfig,
    calculate_mods_frequency,
    call_mods_frequency_to_file,
    write_sitekey2stats,
)

from tests.test_extract_parity import _import_reference_extract


def _import_reference_freqtxt():
    _import_reference_extract()
    import ccsmeth.call_mods_freq_txt as ref_ft

    return ref_ft


def _write_per_readsite(path, n=200, seed=0, chroms=("chr1", "chr2")):
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for i in range(n):
            chrom = chroms[i % len(chroms)]
            pos = int(rng.randint(0, 50)) * 2
            strand = "+" if rng.rand() < 0.7 else "-"
            p1 = round(float(rng.rand()), 6)
            p0 = round(1 - p1, 6)
            label = 1 if p1 > 0.5 else 0
            depth = "{},{}".format(rng.randint(3, 20), rng.randint(3, 20)) \
                if rng.rand() < 0.8 else str(rng.randint(3, 20))
            f.write("\t".join([
                chrom, str(pos), strand, "read/{}/ccs".format(i), str(i), depth,
                str(p0), str(p1), str(label), "ACGCG"]) + "\n")
    # some unmapped rows that must be skipped
    with open(path, "a") as f:
        f.write("\t".join([".", "-1", ".", "r/x/ccs", "5", "9,9", "0.4", "0.6",
                           "1", "ACGCG"]) + "\n")


@pytest.mark.parametrize("kw", [dict(), dict(prob_cf=0.4), dict(rm_1strand=True)])
def test_freqtxt_parity(tmp_path, kw):
    ref_ft = _import_reference_freqtxt()
    p = str(tmp_path / "pr.tsv")
    _write_per_readsite(p)
    ours = calculate_mods_frequency([p], kw.get("prob_cf", 0.0),
                                    kw.get("rm_1strand", False))
    theirs = ref_ft.calculate_mods_frequency([p], kw.get("prob_cf", 0.0),
                                             kw.get("rm_1strand", False))
    assert set(ours.keys()) == set(theirs.keys())
    for k in ours:
        a, b = ours[k], theirs[k]
        assert (a.met, a.unmet, a.coverage) == (b._met, b._unmet, b._coverage)
        assert abs(a.prob_0 - b._prob_0) < 1e-9
        assert abs(a.prob_1 - b._prob_1) < 1e-9
        assert a.kmer == b._kmer
    # file output byte parity
    f_ours = str(tmp_path / "ours.txt")
    f_ref = str(tmp_path / "ref.txt")
    write_sitekey2stats(ours, f_ours, True, False, False)
    ref_ft.write_sitekey2stats(theirs, f_ref, True, False, False)
    assert open(f_ours).read() == open(f_ref).read()
    # bed format parity
    f_ours_bed = str(tmp_path / "ours.bed")
    f_ref_bed = str(tmp_path / "ref.bed")
    write_sitekey2stats(ours, f_ours_bed, True, True, False)
    ref_ft.write_sitekey2stats(theirs, f_ref_bed, True, True, False)
    assert open(f_ours_bed).read() == open(f_ref_bed).read()


def test_freqtxt_e2e_with_contigs(tmp_path):
    p = str(tmp_path / "pr.tsv")
    _write_per_readsite(p, n=120)
    out = str(tmp_path / "freq.txt")
    cfg = FreqTxtConfig(input_path=[p], result_file=out, contigs="chr1,chr2",
                        sort=True)
    res = call_mods_frequency_to_file(cfg)
    lines = open(res).read().splitlines()
    assert lines
    chroms = [line.split("\t")[0] for line in lines]
    assert chroms == sorted(chroms)
    w = lines[0].split("\t")
    assert len(w) == 11 and int(w[8]) == int(w[6]) + int(w[7])


def test_freqtxt_refsites_only(tmp_path):
    from tests.synth import write_fasta

    fasta = str(tmp_path / "ref.fa")
    # chr1: CG at pos 0-1 and 4-5
    write_fasta(fasta, {"chr1": "CGTACGTTTT"})
    p = str(tmp_path / "pr.tsv")
    rows = [
        ("chr1", 0, "+"),  # CG site -> kept
        ("chr1", 2, "+"),  # not CG -> dropped
        ("chr1", 5, "-"),  # rev strand: complement(ref[4:6]) == CG -> kept
    ]
    with open(p, "w") as f:
        for chrom, pos, strand in rows:
            f.write("\t".join([chrom, str(pos), strand, "r/1/ccs", "1", "9,9",
                               "0.2", "0.8", "1", "ACGCG"]) + "\n")
    out = str(tmp_path / "freq.txt")
    cfg = FreqTxtConfig(input_path=[p], result_file=out, refsites_only=True,
                        ref=fasta, sort=True)
    res = call_mods_frequency_to_file(cfg)
    got = [(w[0], int(w[1]), w[3]) for w in
           (line.split("\t") for line in open(res).read().splitlines())]
    assert got == [("chr1", 0, "+"), ("chr1", 5, "-")]
