"""Fail-fast regression tests: a dead pipeline stage must surface its error
instead of deadlocking on a bounded queue (SURVEY.md §5.3 — the reference hangs
its join loops on worker crashes; this engine must not)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.synth import make_synth_bam, write_fasta
from tests.test_call_mods_e2e import _make_ckpt


def test_call_mods_writer_failure_raises(tmp_path, monkeypatch):
    import ccsmeth_tpu.pipeline.call_mods as cm

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=30, read_len=200, ref_len=3000, seed=2)
    fasta = str(tmp_path / "r.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)

    class ExplodingWriter:
        def __init__(self, *a, **kw):
            self.n = 0

        def write(self, rec):
            self.n += 1
            if self.n >= 3:
                raise OSError("disk full (simulated)")

        def close(self):
            pass

    monkeypatch.setattr(cm, "BamWriter", ExplodingWriter)
    cfg = cm.CallModsConfig(model_file=ckpt, mode="align", ref=fasta,
                            batch_size=32, holes_batch=5, no_sort=True)
    import threading

    result = {}

    def run():
        try:
            cm.call_mods_bam(cfg, bam, str(tmp_path / "o"))
            result["err"] = None
        except Exception as e:  # noqa: BLE001
            result["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "call_mods deadlocked on writer failure"
    assert isinstance(result["err"], OSError)


def test_extract_writer_failure_raises(tmp_path, monkeypatch):
    import gzip as real_gzip
    from types import SimpleNamespace

    import ccsmeth_tpu.pipeline.extract as ex

    bam = str(tmp_path / "in.bam")
    make_synth_bam(bam, n_reads=20, read_len=200, ref_len=3000, seed=3)

    class ExplodingFile:
        def __init__(self):
            self.n = 0

        def write(self, s):
            self.n += 1
            if self.n >= 2:
                raise OSError("disk full (simulated)")

        def close(self):
            pass

    monkeypatch.setattr("builtins.open", _open_factory(ExplodingFile()),
                        raising=True)
    args = SimpleNamespace(
        input=bam, output=str(tmp_path / "f.tsv"), gzip=False, mode="denovo",
        seq_len=21, motifs="CG", mod_loc=0, methy_label=1, norm="zscore",
        no_decode=False, holes_batch=10, is_sn="no", is_map="no", ref=None,
        mapq=1, identity=0.0, no_supplementary=False, skip_unmapped="yes",
        holeids_e=None, holeids_ne=None, threads=2)
    import threading

    result = {}

    def run():
        try:
            ex.extract_hifireads_features(args)
            result["err"] = None
        except Exception as e:  # noqa: BLE001
            result["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "extract deadlocked on writer failure"
    assert isinstance(result["err"], OSError)


def _open_factory(exploder):
    import builtins

    real_open = builtins.open

    def fake_open(path, mode="r", *a, **kw):
        if isinstance(path, str) and path.endswith("f.tsv") and "w" in mode:
            return exploder
        return real_open(path, mode, *a, **kw)

    return fake_open
