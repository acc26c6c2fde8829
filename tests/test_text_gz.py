"""Parallel-BGZF text helpers (bamio.create_text_gz / open_text_auto) and the
gzip TSV pipeline paths that ride them.

The engine writes .gz TSVs as BGZF (standard multi-member gzip, so stdlib-
readable, plus bgzip-blocked for parallel re-reads) instead of the reference's
single-threaded gzip.open (extract_features.py:520, call_mods_freq_txt.py:129).
"""

import gzip

import pytest

from ccsmeth_tpu.bamio import create_text_gz, open_text_auto
from ccsmeth_tpu.utils.simulate import make_synth_bam
from tests.synth import write_fasta


ROWS = ["chr%d\t%d\t+\tpayload%d" % (i % 3, i, i * 7) for i in range(5000)]


def _write(path):
    with create_text_gz(path) as w:
        for r in ROWS:
            w.write(r + "\n")


def test_create_text_gz_is_stdlib_gzip_readable(tmp_path):
    p = str(tmp_path / "x.tsv.gz")
    _write(p)
    with gzip.open(p, "rt") as rf:
        assert rf.read().splitlines() == ROWS


@pytest.mark.parametrize("flavor", ["bgzf", "plain_gzip", "raw"])
def test_open_text_auto_reads_all_flavors(tmp_path, flavor):
    p = str(tmp_path / ("x.tsv" + ("" if flavor == "raw" else ".gz")))
    if flavor == "bgzf":
        _write(p)
    elif flavor == "plain_gzip":
        with gzip.open(p, "wt") as w:
            w.write("\n".join(ROWS) + "\n")
    else:
        with open(p, "w") as w:
            w.write("\n".join(ROWS) + "\n")
    with open_text_auto(p) as rf:
        assert [l.rstrip("\n") for l in rf] == ROWS


def test_extract_gzip_output_roundtrips(tmp_path):
    from ccsmeth_tpu.cli import main
    from ccsmeth_tpu.training.data import load_feature_tsv

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=6, read_len=300, ref_len=3000, seed=5)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    out = str(tmp_path / "fx.tsv")
    assert main(["extract", "-i", bam, "-o", out, "--mode", "align",
                 "--ref", fasta, "--gzip"]) == 0
    gz = out + ".gz"
    with gzip.open(gz, "rt") as rf:  # stdlib-compatible on disk
        lines = rf.read().splitlines()
    assert lines and len(lines[0].split("\t")) == 22
    cols = load_feature_tsv(gz)  # and loadable by the trainer's gz path
    first = next(iter(cols.values())) if isinstance(cols, dict) else cols[0]
    assert len(first) == len(lines)
