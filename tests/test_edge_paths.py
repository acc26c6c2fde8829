"""Edge-path coverage: SAM input to call_mods, holeid filters, .npz model files,
tiny-span native streaming, denovo TSV round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ccsmeth_tpu.bamio import BamReader
from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam

from tests.synth import make_synth_bam, write_fasta
from tests.test_call_mods_e2e import _make_ckpt


def _sam_from_bam(bam, sam, header_text):
    from ccsmeth_tpu.utils.constants import CODE2CIGAR

    recs = list(BamReader(bam))
    with open(sam, "w") as f:
        f.write(header_text)
        for r in recs:
            cigar = "".join("{}{}".format(ln, CODE2CIGAR[op]) for op, ln in r.cigar) or "*"
            tags = []
            for tag, ty, v in r.tags:
                if ty in ("i", "c", "C", "s", "S", "I"):
                    tags.append("{}:i:{}".format(tag, int(v)))
                elif ty == "f":
                    tags.append("{}:f:{}".format(tag, float(v)))
                elif ty in ("Z", "A", "H"):
                    tags.append("{}:{}:{}".format(tag, ty, v))
                elif ty.startswith("B"):
                    sub = ty[1]
                    body = ",".join(str(float(x) if sub == "f" else int(x))
                                    for x in np.asarray(v))
                    tags.append("{}:B:{},{}".format(tag, sub, body))
            qual = "".join(chr(q + 33) for q in r.qual) if r.qual is not None else "*"
            f.write("\t".join([r.qname, str(r.flag), "chrS", str(r.pos + 1),
                               str(r.mapq), cigar, "*", "0", "0", r.seq, qual]
                              + tags) + "\n")


def test_call_mods_sam_input(tmp_path):
    bam = str(tmp_path / "in.bam")
    refseq, header_text = make_synth_bam(bam, n_reads=6, read_len=200, ref_len=2000,
                                         seed=4)
    sam = str(tmp_path / "in.sam")
    _sam_from_bam(bam, sam, header_text)
    fasta = str(tmp_path / "r.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)
    cfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta, batch_size=64,
                         no_sort=True)
    out_b = call_mods_bam(cfg, bam, str(tmp_path / "ob"))
    out_s = call_mods_bam(cfg, sam, str(tmp_path / "os"))
    tags_b = {r.qname: r.get_tag("MM") for r in BamReader(out_b) if r.has_tag("MM")}
    tags_s = {r.qname: r.get_tag("MM") for r in BamReader(out_s) if r.has_tag("MM")}
    assert tags_b == tags_s and len(tags_b) >= 5


def test_call_mods_holeid_filters(tmp_path):
    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=8, read_len=200, ref_len=2000, seed=5)
    fasta = str(tmp_path / "r.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)
    keep = str(tmp_path / "keep.txt")
    with open(keep, "w") as f:
        f.write("m0/0/ccs\nm0/1/ccs\nm0/2/ccs\n")
    cfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta, batch_size=64,
                         holeids_e=keep, no_sort=True)
    out = call_mods_bam(cfg, bam, str(tmp_path / "o"))
    tagged = [r.qname for r in BamReader(out) if r.has_tag("MM")]
    assert set(tagged) <= {"m0/0/ccs", "m0/1/ccs", "m0/2/ccs"}
    # exclusion filter
    cfg2 = CallModsConfig(model_file=ckpt, mode="align", ref=fasta, batch_size=64,
                          holeids_ne=keep, no_sort=True)
    out2 = call_mods_bam(cfg2, bam, str(tmp_path / "o2"))
    tagged2 = [r.qname for r in BamReader(out2) if r.has_tag("MM")]
    assert not set(tagged2) & {"m0/0/ccs", "m0/1/ccs", "m0/2/ccs"}
    assert tagged2


def test_call_mods_with_npz_model(tmp_path):
    from ccsmeth_tpu.models import AttRNNConfig
    from ccsmeth_tpu.models.convert import torch_ckpt_to_params
    from ccsmeth_tpu.models.params_io import save_params

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=5, read_len=200, ref_len=2000, seed=6)
    fasta = str(tmp_path / "r.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)
    params = torch_ckpt_to_params(ckpt, AttRNNConfig(dropout_rate=0))
    npz = str(tmp_path / "model.npz")
    save_params(npz, params)
    base = dict(mode="align", ref=fasta, batch_size=64, no_sort=True)
    out_t = call_mods_bam(CallModsConfig(model_file=ckpt, **base), bam,
                          str(tmp_path / "t"))
    out_n = call_mods_bam(CallModsConfig(model_file=npz, **base), bam,
                          str(tmp_path / "n"))
    tags_t = {r.qname: (r.get_tag("MM") if r.has_tag("MM") else None)
              for r in BamReader(out_t)}
    tags_n = {r.qname: (r.get_tag("MM") if r.has_tag("MM") else None)
              for r in BamReader(out_n)}
    assert tags_t == tags_n


def test_native_streaming_tiny_spans(tmp_path):
    """Spanned native decode with spans smaller than one block must fall back
    cleanly and still produce identical bytes."""
    from ccsmeth_tpu.bamio.bgzf import BgzfReader, BgzfWriter

    data = bytes(np.random.RandomState(0).randint(0, 256, 400_000, dtype=np.uint8))
    p = str(tmp_path / "x.bgzf")
    with BgzfWriter(p, use_native=False) as w:
        w.write(data)
    r = BgzfReader(p)
    r.NATIVE_SPAN = 1000  # smaller than a block: exercises pushback fallback
    assert r.read() == data
    r2 = BgzfReader(p)
    r2.NATIVE_SPAN = 70000  # ~1 block per span
    assert r2.read() == data
