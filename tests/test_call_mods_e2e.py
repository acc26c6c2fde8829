"""End-to-end call_mods golden gate: our pipeline's modbam MM/ML bytes must be
bit-equal to an oracle built ONLY from reference components (reference extraction fn,
reference torch model with zero h0, reference MM/ML encoders)."""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ccsmeth_tpu.bamio import BamReader
from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam, call_mods_txt

from tests.synth import make_synth_bam, write_fasta
from tests.test_extract_parity import FakeSegment, _import_reference_extract, _ref_args
from tests.refmodels import import_reference_models


def _import_reference_bam2modbam():
    _import_reference_extract()  # stubs pysam/statsmodels
    for name in ("tabix", "pybedtools"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    import ccsmeth._bam2modbam as ref_b2m

    return ref_b2m


def _make_ckpt(tmp_path, seed=7):
    ref_models = import_reference_models()
    torch.manual_seed(seed)
    tm = ref_models.ModelAttRNN(21, 3, 2, 0, 256, model_type="attbigru2s")
    tm.eval()
    # zero-h0 for deterministic oracle (engine default)
    tm.init_hidden = lambda b, nl, h: torch.zeros(nl * 2, b, h)
    p = str(tmp_path / "model.ckpt")
    torch.save(tm.state_dict(), p)
    return tm, p


def _oracle_read_tags(tm, rec, refname, dnacontigs, args, ref_extract, ref_b2m):
    """Reference-semantics per-read MM/ML: extract -> torch forward -> encode."""
    from ccsmeth_tpu.utils.constants import BASE2CODE_DNA

    feats = ref_extract.extract_features_from_double_strand_read(
        FakeSegment(rec, refname), ["CG"], None, None, dnacontigs, args)
    if len(feats) == 0:
        return None, None
    t = lambda a: torch.tensor(np.asarray(a, dtype=np.float32))
    fk = [[BASE2CODE_DNA[c] for c in f[5]] for f in feats]
    fp_ = [[f[6]] * 21 for f in feats]
    fim = [f[7] for f in feats]
    fpm = [f[9] for f in feats]
    rk = [[BASE2CODE_DNA[c] for c in f[13]] for f in feats]
    rp_ = [[f[14]] * 21 for f in feats]
    rim = [f[15] for f in feats]
    rpm = [f[17] for f in feats]
    zeros = torch.zeros(len(feats), 21)
    z4 = torch.zeros(len(feats), 4)
    with torch.no_grad():
        _, probs = tm(t(fk), t(fp_), t(fim), zeros, t(fpm), zeros, z4, zeros,
                      t(rk), t(rp_), t(rim), zeros, t(rpm), zeros, z4, zeros)
    probs = probs.numpy()
    locs = [f[4] for f in feats]
    p1n = [round(float(p[1]) / (float(p[0]) + float(p[1])), 6) for p in probs]
    pairs = sorted(zip(locs, p1n))
    fwd = rec.get_forward_sequence()
    mm = ref_b2m._convert_locs_to_mmtag([p[0] for p in pairs], fwd)
    ml = ref_b2m._convert_probs_to_mltag([p[1] for p in pairs])
    return "C+m?," + ",".join(map(str, mm)) + ";", ml


def test_call_mods_bam_bitparity_vs_reference_oracle(tmp_path):
    ref_extract = _import_reference_extract()
    ref_b2m = _import_reference_bam2modbam()
    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=12, read_len=300, ref_len=3000, seed=21)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    tm, ckpt = _make_ckpt(tmp_path)

    cfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta, batch_size=64)
    out = call_mods_bam(cfg, bam, str(tmp_path / "out"))

    args = _ref_args(mode="align")
    dnacontigs = {"chrS": refseq}
    oracle = {}
    for rec in BamReader(bam):
        mm, ml = _oracle_read_tags(tm, rec, "chrS", dnacontigs, args, ref_extract, ref_b2m)
        oracle[rec.qname] = (mm, ml)

    n_tagged = 0
    for rec in BamReader(out):
        mm_o, ml_o = oracle[rec.qname]
        if mm_o is None:
            assert not rec.has_tag("MM")
            continue
        n_tagged += 1
        assert rec.get_tag("MM") == mm_o, rec.qname
        np.testing.assert_array_equal(rec.get_tag("ML"),
                                      np.asarray(ml_o, dtype=np.uint8))
        # pulse tags stripped (reference _refill_tags)
        for t_ in ("fi", "fp", "ri", "rp"):
            assert not rec.has_tag(t_)
        assert rec.has_tag("fn")  # non-pulse tags preserved
    assert n_tagged >= 10


def test_call_mods_bam_output_sorted_with_pg(tmp_path):
    bam = str(tmp_path / "in.bam")
    make_synth_bam(bam, n_reads=6, read_len=200, ref_len=2000, seed=3)
    _tm, ckpt = _make_ckpt(tmp_path)
    cfg = CallModsConfig(model_file=ckpt, mode="denovo", batch_size=32)
    out = call_mods_bam(cfg, bam, str(tmp_path / "o"))
    rd = BamReader(out)
    assert "@PG" in rd.header.text and "ccsmeth_tpu" in rd.header.text
    poss = [r.pos for r in rd]
    assert poss == sorted(poss)


def test_call_mods_bam_keep_pulse(tmp_path):
    bam = str(tmp_path / "in.bam")
    make_synth_bam(bam, n_reads=4, read_len=200, ref_len=2000, seed=4)
    _tm, ckpt = _make_ckpt(tmp_path)
    cfg = CallModsConfig(model_file=ckpt, mode="denovo", batch_size=32,
                         keep_pulse=True, no_sort=True)
    out = call_mods_bam(cfg, bam, str(tmp_path / "o2"))
    recs = list(BamReader(out))
    assert any(r.has_tag("fi") for r in recs)


def test_call_mods_txt_path(tmp_path):
    """extract TSV -> call_mods per_readsite output (format + row count)."""
    from ccsmeth_tpu.features import ExtractConfig, extract_read_features, features_to_tsv_rows
    from ccsmeth_tpu.utils.codecs import get_motif_seqs

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=5, read_len=250, ref_len=2500, seed=6)
    ecfg = ExtractConfig(mode="align")
    motifs = get_motif_seqs("CG")
    tsv = str(tmp_path / "fx.tsv")
    n_rows = 0
    with open(tsv, "w") as f:
        for rec in BamReader(bam):
            rf = extract_read_features(rec, motifs, ecfg, {"chrS": refseq}, refname="chrS")
            if rf is None:
                continue
            rows = features_to_tsv_rows(rf, False, False)
            n_rows += len(rows)
            f.write("\n".join(rows) + "\n")
    _tm, ckpt = _make_ckpt(tmp_path)
    cfg = CallModsConfig(model_file=ckpt, batch_size=32)
    out = call_mods_txt(cfg, tsv, str(tmp_path / "o3"))
    lines = open(out).read().splitlines()
    assert len(lines) == n_rows
    w = lines[0].split("\t")
    assert len(w) == 10
    chrom, pos, strand, holeid, loc, depth, p0, p1, label, kmer = w
    assert strand in "+-" and "," in depth and len(kmer) == 5
    assert abs(float(p0) + float(p1) - 1.0) < 2e-6
    assert label in ("0", "1")


def test_call_mods_bam_read_sharding(tmp_path):
    """Union of per-process shard modbams == the unsharded modbam (stable qname
    hash ownership; every read lands in exactly one shard, tags identical)."""
    bam = str(tmp_path / "in.bam")
    make_synth_bam(bam, n_reads=12, read_len=200, ref_len=2000, seed=5)
    _tm, ckpt = _make_ckpt(tmp_path)

    def read_tags(path):
        out = {}
        for rec in BamReader(path):
            d = {t[0]: t[-1] for t in rec.tags}
            ml = d.get("ML")
            out[rec.qname] = (d.get("MM"), tuple(int(v) for v in ml)
                              if ml is not None else None)
        return out

    cfg = CallModsConfig(model_file=ckpt, mode="denovo", batch_size=32)
    full = read_tags(call_mods_bam(cfg, bam, str(tmp_path / "full")))

    merged = {}
    shard_sizes = []
    for pid in range(2):
        cfg_s = CallModsConfig(model_file=ckpt, mode="denovo", batch_size=32,
                               num_processes=2, process_id=pid)
        got = read_tags(call_mods_bam(cfg_s, bam, str(tmp_path / f"s{pid}")))
        shard_sizes.append(len(got))
        assert not set(got) & set(merged), "read owned by two shards"
        merged.update(got)
    assert all(n > 0 for n in shard_sizes), "both shards must own reads"
    assert merged == full

    with pytest.raises(ValueError):
        call_mods_bam(CallModsConfig(model_file=ckpt, mode="denovo",
                                     num_processes=2, process_id=7),
                      bam, str(tmp_path / "bad"))


def test_call_mods_pipeline_memory_capped_stress(tmp_path, monkeypatch):
    """Whole-pipeline memory gate (VERDICT r3 next #6): with --sort_mem_mb
    capped, call_mods peak memory must NOT grow with output size (the
    htslib-scale behavior the disk-backed sort replaces, reference
    call_modifications.py:592-607), and the capped run's sorted modbam must
    be byte-identical to the unconstrained run's.

    Method: the streaming pipeline holds a bounded working set (item-bounded
    queues of decoded reads) that dwarfs small test files, so the gate
    measures GROWTH — peak(capped, 4x records) - peak(capped, 1x records)
    stays near zero while the uncapped in-RAM sort grows by ~the extra
    output bytes. Reads are long but CG-sparse so record bytes, not feature
    tensors, are the scaling term."""
    import tracemalloc

    from ccsmeth_tpu.bamio import BamHeader, BamWriter
    from ccsmeth_tpu.bamio import bgzf as bgzf_mod
    from ccsmeth_tpu.utils.simulate import make_read

    # the BGZF codec's by-design resident constants (32 MB compressed per
    # native read span, ~8 MB buffered per write span) dwarf this fixture;
    # shrink them so the gate measures the pipeline's SCALING, not the
    # constants (same code paths — span size never changes output bytes)
    monkeypatch.setattr(bgzf_mod.BgzfReader, "NATIVE_SPAN", 1 << 20)
    monkeypatch.setattr(bgzf_mod.BgzfWriter, "NATIVE_SPAN",
                        16 * 65280)  # ~1 MB, multiple of _MAX_BLOCK_DATA
    import functools

    from ccsmeth_tpu.bamio import bai as bai_mod

    monkeypatch.setattr(
        bai_mod, "build_index",
        functools.partial(bai_mod.build_index, span_bytes=256 << 10))

    # tiny model: the default 3x256 ckpt's load/convert transient would
    # swamp the record-stream deltas this gate measures
    ref_models = import_reference_models()
    torch.manual_seed(3)
    tm = ref_models.ModelAttRNN(21, 1, 2, 0, 24, model_type="attbigru2s")
    ckpt = str(tmp_path / "tiny.ckpt")
    torch.save(tm.state_dict(), ckpt)
    rng = np.random.RandomState(5)
    read_len = 3000
    bases = np.frombuffer(b"ATG", dtype=np.uint8)  # no C: CG only as planted

    def make_bam(path, n_reads):
        header = BamHeader(
            "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:99999\n",
            [("c1", 99999)])
        with BamWriter(path, header) as w:
            for i in range(n_reads):
                arr = bases[rng.randint(0, 3, size=read_len)].copy()
                for j in rng.randint(50, read_len - 50, size=6):
                    arr[j], arr[j + 1] = ord("C"), ord("G")
                w.write(make_read(rng, arr.tobytes().decode(),
                                  "m0/{}/ccs".format(i), flag=0, ref_id=0,
                                  pos=int(rng.randint(0, 90000))))

    small_bam = str(tmp_path / "small.bam")
    big_bam = str(tmp_path / "big.bam")
    make_bam(small_bam, 500)
    make_bam(big_bam, 2000)  # 4x the records => ~3x+ the sorted output bytes

    def run(bam, tag, sort_mem_mb):
        # holes_batch=2 keeps worst-case queue occupancy (batch_q 8 items +
        # write_q 16 + pending 16, bounded in READS) well under the gate
        cfg = CallModsConfig(model_file=ckpt, mode="denovo", batch_size=256,
                             layer_rnn=1, hid_rnn=24, holes_batch=2,
                             sort_mem_mb=sort_mem_mb)
        tracemalloc.start()
        tracemalloc.reset_peak()
        out = call_mods_bam(cfg, bam, str(tmp_path / tag))
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        return out, peak

    out_s_cap, peak_s_cap = run(small_bam, "s_cap", sort_mem_mb=1)
    out_b_cap, peak_b_cap = run(big_bam, "b_cap", sort_mem_mb=1)
    out_b_unc, peak_b_unc = run(big_bam, "b_unc", sort_mem_mb=1 << 20)
    with open(out_b_unc, "rb") as a, open(out_b_cap, "rb") as b:
        assert a.read() == b.read(), "capped sort changed the output bytes"
    # the sort buffers RAW (uncompressed) record blobs — size the gate on
    # those, not the BGZF-compressed file
    from ccsmeth_tpu.bamio.bam import _iter_raw_records
    from ccsmeth_tpu.bamio.bgzf import BgzfReader

    def raw_bytes(path):
        rd = BamReader(path)
        try:
            return sum(len(r) for r in _iter_raw_records(rd._bgzf))
        finally:
            rd.close()

    extra = raw_bytes(out_b_cap) - raw_bytes(out_s_cap)
    assert extra > 4 << 20, "fixture too small ({} extra bytes)".format(extra)
    # capped: 4x the records may not cost more than a fraction of the extra
    # output (bounded queues + ~1 MB sort buffer; NOT the record stream)
    grow_cap = peak_b_cap - peak_s_cap
    assert grow_cap < extra // 2, \
        "capped peak grew {} bytes for {} extra output bytes".format(
            grow_cap, extra)
    # sanity that the gate bites: the uncapped in-RAM sort holds the whole
    # (bigger, uncompressed) record stream over the capped run's peak
    assert peak_b_unc > peak_b_cap + extra, \
        "uncapped run did not scale with the record stream " \
        "(unc {} vs cap {} + extra {})".format(peak_b_unc, peak_b_cap, extra)
    n = sum(1 for _ in BamReader(out_b_cap))
    assert n == 2000
    poss = [(r.ref_id, r.pos) for r in BamReader(out_b_cap)]
    assert poss == sorted(poss)
