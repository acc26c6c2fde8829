"""Feature-extraction parity: our vectorized extractor vs the REFERENCE's own
``extract_features_from_double_strand_read`` (imported with stubbed pysam/statsmodels
and a duck-typed AlignedSegment), on synthetic reads — denovo and align modes,
forward and reverse strands, all normalization methods."""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from ccsmeth_tpu.bamio import BamReader
from ccsmeth_tpu.features import (
    ExtractConfig,
    batch_from_reads,
    extract_read_features,
    features_to_tsv_rows,
)
from ccsmeth_tpu.utils.codecs import get_motif_seqs

from tests.synth import make_synth_bam


def _import_reference_extract():
    if "pysam" not in sys.modules:
        stub = types.ModuleType("pysam")
        stub.utils = SimpleNamespace(SamtoolsError=Exception)
        sys.modules["pysam"] = stub
    if "statsmodels" not in sys.modules:
        sm = types.ModuleType("statsmodels")
        rb = types.ModuleType("statsmodels.robust")

        def _mad(x):
            x = np.asarray(x)
            return np.median(np.abs(x - np.median(x))) / 0.6744897501960817

        rb.scale = SimpleNamespace(mad=_mad)
        sm.robust = rb
        sys.modules["statsmodels"] = sm
        sys.modules["statsmodels.robust"] = rb
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import ccsmeth.extract_features as ref_extract

    return ref_extract


class FakeSegment:
    """Duck-typed pysam.AlignedSegment over our BamRecord."""

    def __init__(self, rec, refname):
        self._r = rec
        self.query_name = rec.qname
        self.query_alignment_start = rec.query_alignment_start
        self.query_alignment_end = rec.query_alignment_end
        self.reference_name = refname
        self.reference_start = rec.pos
        self.reference_end = rec.reference_end
        self.cigartuples = rec.cigar
        self.flag = rec.flag
        self.mapping_quality = rec.mapq
        self.is_unmapped = rec.is_unmapped
        self.is_secondary = rec.is_secondary
        self.is_duplicate = rec.is_duplicate
        self.is_supplementary = rec.is_supplementary
        self.is_reverse = rec.is_reverse

    def get_forward_sequence(self):
        return self._r.get_forward_sequence()

    def get_forward_qualities(self):
        return []

    def get_cigar_stats(self):
        return (list(self._r.get_cigar_stats()), None)

    def get_tag(self, tag):
        try:
            v = self._r.get_tag(tag)
        except KeyError:
            raise KeyError(tag)
        if isinstance(v, np.ndarray):
            return v.tolist()
        return v


def _ref_args(mode="denovo", norm="zscore", is_sn="no", is_map="no",
              skip_unmapped="yes", seq_len=21):
    return SimpleNamespace(
        mode=mode, seq_len=seq_len, motifs="CG", mod_loc=0, methy_label=1,
        norm=norm, no_decode=False, holes_batch=50, is_sn=is_sn, is_map=is_map,
        mapq=1, identity=0.0, no_supplementary=False, skip_unmapped=skip_unmapped,
    )


def _compare(rec, refname, dnacontigs, cfg, args, ref_extract):
    motifs = get_motif_seqs(cfg.motifs)
    ours = extract_read_features(rec, motifs, cfg, dnacontigs, refname=refname)
    theirs = ref_extract.extract_features_from_double_strand_read(
        FakeSegment(rec, refname), motifs, None, None, dnacontigs, args)
    if ours is None:
        assert len(theirs) == 0
        return 0
    assert ours.n_sites == len(theirs)
    for i, row in enumerate(theirs):
        (chrom, chrom_pos, strand, seq_name, loc,
         fkmer_seq, npass_fwd, fkmer_im, _fisd, fkmer_pm, _fpsd, fkmer_sn, fkmer_map,
         rkmer_seq, npass_rev, rkmer_im, _risd, rkmer_pm, _rpsd, rkmer_sn, rkmer_map,
         label) = row
        assert ours.chrom == chrom and ours.strand == strand
        assert ours.read_name == seq_name
        assert int(ours.locs[i]) == loc
        assert int(ours.chrom_pos[i]) == chrom_pos
        assert ours.fkmer_bytes[i].tobytes().decode() == fkmer_seq
        assert ours.rkmer_bytes[i].tobytes().decode() == rkmer_seq
        assert ours.npass_fwd == npass_fwd and ours.npass_rev == npass_rev
        np.testing.assert_array_equal(ours.fipd[i], np.asarray(fkmer_im))
        np.testing.assert_array_equal(ours.fpw[i], np.asarray(fkmer_pm))
        np.testing.assert_array_equal(ours.ripd[i], np.asarray(rkmer_im))
        np.testing.assert_array_equal(ours.rpw[i], np.asarray(rkmer_pm))
        if args.is_map == "yes" and not isinstance(fkmer_map, str):
            np.testing.assert_array_equal(ours.fmap[i], np.asarray(fkmer_map))
            np.testing.assert_array_equal(ours.rmap[i], np.asarray(rkmer_map))
        if args.is_sn == "yes" and not isinstance(fkmer_sn, str):
            np.testing.assert_array_equal(ours.sn, np.asarray(fkmer_sn))
        assert ours.label == label
    return ours.n_sites


@pytest.mark.parametrize("norm", ["zscore", "min-max", "min-mean", "mad", "none"])
def test_extract_parity_denovo(tmp_path, norm):
    ref_extract = _import_reference_extract()
    p = str(tmp_path / "s.bam")
    make_synth_bam(p, n_reads=6, read_len=300, ref_len=2000, seed=11)
    cfg = ExtractConfig(mode="denovo", norm=norm)
    args = _ref_args(mode="denovo", norm=norm)
    total = 0
    for rec in BamReader(p):
        total += _compare(rec, None, None, cfg, args, ref_extract)
    assert total > 20


@pytest.mark.parametrize("skip_unmapped", ["yes", "no"])
def test_extract_parity_align(tmp_path, skip_unmapped):
    ref_extract = _import_reference_extract()
    p = str(tmp_path / "s.bam")
    refseq, _ = make_synth_bam(p, n_reads=8, read_len=300, ref_len=3000, seed=5)
    dnacontigs = {"chrS": refseq}
    cfg = ExtractConfig(mode="align", skip_unmapped=(skip_unmapped == "yes"))
    args = _ref_args(mode="align", skip_unmapped=skip_unmapped)
    total = 0
    rd = BamReader(p)
    for rec in rd:
        total += _compare(rec, "chrS", dnacontigs, cfg, args, ref_extract)
    assert total > 20


def test_extract_parity_align_softclip_and_map(tmp_path):
    """Reads with soft clips + indels exercise the CIGAR mapping and map features."""
    ref_extract = _import_reference_extract()
    from tests.synth import make_read, random_seq, write_fasta
    from ccsmeth_tpu.bamio import BamHeader, BamWriter
    from ccsmeth_tpu.utils.codecs import complement_seq

    rng = np.random.RandomState(4)
    refseq = random_seq(rng, 2000)
    # forward read: 10S 150M 2I 100M 3D 38M  (query len = 300)
    q = refseq[500:791]  # ref span consumed: 150M + 100M + 3D + 38M = 291
    query = random_seq(rng, 10) + q[:150] + "AC" + q[150:250] + q[253:291]
    cigar = [(4, 10), (0, 150), (1, 2), (0, 100), (2, 3), (0, 38)]
    rec_f = make_read(rng, query, "fwd/1/ccs", flag=0, ref_id=0, pos=500, cigar=cigar)
    # reverse read of the same region
    rec_r = make_read(rng, complement_seq(query), "rev/1/ccs", flag=16, ref_id=0,
                      pos=500, cigar=cigar[::-1])
    p = str(tmp_path / "sc.bam")
    with BamWriter(p, BamHeader("@SQ\tSN:chrS\tLN:2000\n", [("chrS", 2000)])) as w:
        w.write(rec_f)
        w.write(rec_r)
    dnacontigs = {"chrS": refseq}
    for skip in ("yes", "no"):
        cfg = ExtractConfig(mode="align", skip_unmapped=(skip == "yes"), is_map=True)
        args = _ref_args(mode="align", skip_unmapped=skip, is_map="yes")
        total = 0
        for rec in BamReader(p):
            total += _compare(rec, "chrS", dnacontigs, cfg, args, ref_extract)
        assert total > 10


def test_extract_parity_sn(tmp_path):
    ref_extract = _import_reference_extract()
    p = str(tmp_path / "s.bam")
    make_synth_bam(p, n_reads=4, read_len=200, ref_len=1500, seed=9)
    cfg = ExtractConfig(mode="denovo", is_sn=True)
    args = _ref_args(is_sn="yes")
    for rec in BamReader(p):
        _compare(rec, None, None, cfg, args, ref_extract)


def test_tsv_rows_match_reference_strings(tmp_path):
    """features_to_tsv_rows must byte-match the reference's _features_to_str."""
    ref_extract = _import_reference_extract()
    p = str(tmp_path / "s.bam")
    refseq, _ = make_synth_bam(p, n_reads=4, read_len=250, ref_len=2000, seed=13)
    dnacontigs = {"chrS": refseq}
    cfg = ExtractConfig(mode="align")
    args = _ref_args(mode="align")
    motifs = get_motif_seqs("CG")
    for rec in BamReader(p):
        ours = extract_read_features(rec, motifs, cfg, dnacontigs, refname="chrS")
        theirs = ref_extract.extract_features_from_double_strand_read(
            FakeSegment(rec, "chrS"), motifs, None, None, dnacontigs, args)
        if ours is None:
            assert len(theirs) == 0
            continue
        our_rows = features_to_tsv_rows(ours, cfg.is_sn, cfg.is_map)
        ref_rows = [ref_extract._features_to_str(t) for t in theirs]
        assert our_rows == ref_rows


def test_batch_from_reads_shapes(tmp_path):
    p = str(tmp_path / "s.bam")
    make_synth_bam(p, n_reads=5, read_len=300, ref_len=2000, seed=2)
    cfg = ExtractConfig(mode="denovo")
    motifs = get_motif_seqs("CG")
    feats = [extract_read_features(r, motifs, cfg) for r in BamReader(p)]
    batch = batch_from_reads(feats)
    N = len(batch)
    assert N == sum(f.n_sites for f in feats if f is not None)
    for name in ("kmer", "ipd_means", "pw_means", "kmer2", "ipd_means2"):
        assert getattr(batch, name).shape == (N, 21)
    assert batch.kmer.dtype == np.uint8
    assert batch.ipd_means.dtype == np.float32
    assert batch.kpass.shape == (N,)  # per-read scalar, broadcast on device
    assert batch.sns is None  # sn extraction off -> lazy channel
    mf = batch.model_feats()
    assert mf["kpass"].shape == (N, 21) and mf["sns"].shape == (N, 4)
    cf = batch.compact_feats()
    assert "sns" not in cf and cf["kmer"].dtype == np.int8
    padded = batch.pad_to(N + 7)
    assert len(padded) == N + 7 and padded.n_valid == N
    np.testing.assert_array_equal(padded.kmer[:N], batch.kmer)
    assert float(np.abs(padded.kmer[N:].astype(int)).sum()) == 0.0
