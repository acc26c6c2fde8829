"""TBI index build + query over bgzipped bed: query must match a brute-force scan."""

import numpy as np

from ccsmeth_tpu.bamio.bgzf import BgzfWriter
from ccsmeth_tpu.bamio.tabix import TabixFile, build_tabix_index


def _make_bed(tmp_path, n=5000, chroms=("chr1", "chr2")):
    rows = []
    rng = np.random.RandomState(0)
    for chrom in chroms:
        poss = np.sort(rng.choice(np.arange(0, 500000), size=n // len(chroms),
                                  replace=False))
        for p in poss:
            rows.append((chrom, int(p), int(p) + 1, ".", 10, "+"))
    path = str(tmp_path / "x.bed.gz")
    with BgzfWriter(path) as w:
        for r in rows:
            w.write(("\t".join(map(str, r)) + "\n").encode())
    return path, rows


def test_build_and_query(tmp_path):
    path, rows = _make_bed(tmp_path)
    tbi = build_tabix_index(path)
    assert tbi.endswith(".tbi")
    tf = TabixFile(path)
    for chrom, beg, end in [("chr1", 0, 1000), ("chr1", 123456, 130000),
                            ("chr2", 499000, 500000), ("chr1", 0, 500000)]:
        got = sorted(int(line.split("\t")[1]) for line in tf.query(chrom, beg, end))
        want = sorted(r[1] for r in rows if r[0] == chrom and beg <= r[1] < end)
        assert got == want, (chrom, beg, end, len(got), len(want))


def test_query_unknown_seq(tmp_path):
    path, _rows = _make_bed(tmp_path, n=100)
    tf = TabixFile(path)
    assert list(tf.query("chrX", 0, 1000)) == []


def test_freqb_gzip_produces_tbi(tmp_path):
    import pytest

    torch = pytest.importorskip("torch")
    from tests.synth import make_synth_bam, write_fasta
    from tests.test_call_mods_e2e import _make_ckpt
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam
    from ccsmeth_tpu.pipeline.call_freq_bam import (FreqBamConfig,
                                                    call_mods_frequency_from_bamfile)
    import os

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=10, read_len=200, ref_len=2000, seed=1)
    fasta = str(tmp_path / "r.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)
    modbam = call_mods_bam(CallModsConfig(model_file=ckpt, mode="align", ref=fasta,
                                          batch_size=64), bam, str(tmp_path / "m"))
    outs = call_mods_frequency_from_bamfile(FreqBamConfig(
        input_bam=modbam, ref=fasta, output=str(tmp_path / "f"), sort=True,
        gzip=True, bed=True))
    out_all = [p for p in outs if ".all." in p][0]
    assert out_all.endswith(".gz") and os.path.exists(out_all + ".tbi")
    tf = TabixFile(out_all)
    assert len(list(tf.query("chrS", 0, 2000))) > 5


def test_multiblock_wide_coordinates(tmp_path):
    """Stress: rows across many BGZF blocks and bin levels (coords to 60M, long
    payloads forcing block splits); queries spanning block and bin boundaries
    must equal brute force, including duplicate positions."""
    rng = np.random.RandomState(7)
    poss = np.sort(rng.choice(np.arange(0, 60_000_000, dtype=np.int64),
                              size=20000, replace=False))
    poss = np.concatenate([poss, poss[:100]])  # duplicated rows, distinct payload
    poss.sort(kind="stable")
    path = str(tmp_path / "wide.bed.gz")
    pad = "x" * 200  # ~4.1MB uncompressed -> dozens of BGZF blocks
    with BgzfWriter(path) as w:
        for k, p in enumerate(poss):
            w.write(f"chrW\t{int(p)}\t{int(p)+1}\trow{k}\t{pad}\n".encode())
    build_tabix_index(path)
    tf = TabixFile(path)
    plist = [int(p) for p in poss]
    for beg, end in [(0, 1000), (16_383, 16_385), (1_000_000, 1_100_000),
                     (59_000_000, 60_000_000), (0, 60_000_000),
                     (int(poss[len(poss)//2]), int(poss[len(poss)//2]) + 1)]:
        got = sorted(int(l.split("\t")[1]) for l in tf.query("chrW", beg, end))
        want = sorted(p for p in plist if beg <= p < end)
        assert got == want, (beg, end, len(got), len(want))
