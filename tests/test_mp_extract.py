"""Multiprocess extraction path: identical output to in-process extraction."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ccsmeth_tpu.bamio import BamReader
from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam

from tests.synth import make_synth_bam, write_fasta
from tests.test_call_mods_e2e import _make_ckpt


def test_mp_extraction_matches_inprocess(tmp_path):
    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=20, read_len=300, ref_len=3000, seed=8)
    fasta = str(tmp_path / "r.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)
    base = dict(model_file=ckpt, mode="align", ref=fasta, batch_size=64,
                holes_batch=7, no_sort=True)
    out1 = call_mods_bam(CallModsConfig(**base, threads=1), bam,
                         str(tmp_path / "serial"))
    out2 = call_mods_bam(CallModsConfig(**base, threads=6), bam,
                         str(tmp_path / "mp"))

    def tags(path):
        return {r.qname: (r.get_tag("MM") if r.has_tag("MM") else None,
                          tuple(r.get_tag("ML")) if r.has_tag("ML") else None)
                for r in BamReader(path)}

    assert tags(out1) == tags(out2)
