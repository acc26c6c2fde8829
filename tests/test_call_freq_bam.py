"""call_freqb parity: our linear-scan frequency caller vs the reference's
per-region implementation (imported with stubs, duck-typed pysam objects), on a
modbam produced by our own call_mods — count and aggregate modes, haplotypes,
refsites filters, bedMethyl line format."""

import io
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ccsmeth_tpu.bamio import BamReader, BamWriter
from ccsmeth_tpu.pipeline.call_freq_bam import (
    FreqBamConfig,
    call_mods_frequency_from_bamfile,
)
from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam
from ccsmeth_tpu.utils.codecs import aligned_pairs_from_cigar

from tests.synth import make_synth_bam, write_fasta
from tests.test_call_mods_e2e import _make_ckpt
from tests.test_extract_parity import _import_reference_extract

AGGRE_CKPT = "/root/reference/models/model_ccsmeth_5mCpG_aggregate_attbigru_b11.v2p.ckpt"


def _import_reference_freq():
    _import_reference_extract()
    for name in ("tabix", "pybedtools"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    import ccsmeth.call_mods_freq_bam as ref_freq

    return ref_freq


class FreqFakeSegment:
    def __init__(self, rec):
        self._r = rec
        self.query_name = rec.qname
        self.is_unmapped = rec.is_unmapped
        self.is_secondary = rec.is_secondary
        self.is_duplicate = rec.is_duplicate
        self.is_supplementary = rec.is_supplementary
        self.is_reverse = rec.is_reverse
        self.mapping_quality = rec.mapq
        self.modified_bases = None  # force MM/ML tag parsing path

    def get_cigar_stats(self):
        return (list(self._r.get_cigar_stats()), None)

    def get_tag(self, tag):
        v = self._r.get_tag(tag)
        if isinstance(v, np.ndarray):
            return v.tolist()
        return v

    def get_forward_sequence(self):
        return self._r.get_forward_sequence()

    def get_aligned_pairs(self, matches_only=False):
        pairs = aligned_pairs_from_cigar(self._r.cigar, self._r.pos, matches_only)
        return [(int(q) if q >= 0 else None, int(r) if r >= 0 else None)
                for q, r in pairs]


class FakeBamReader:
    def __init__(self, recs):
        self.recs = recs

    def fetch(self, contig, start, stop):
        for rec in self.recs:
            if rec.ref_id < 0:
                continue
            if rec.pos < stop and rec.reference_end > start:
                yield FreqFakeSegment(rec)


def _ref_freq_args(**kw):
    args = SimpleNamespace(
        modtype="5mC", call_mode="count", prob_cf=0.0, no_amb_cov=False,
        hap_tag="HP", mapq=1, identity=0.0, no_supplementary=False, motifs="CG",
        mod_loc=0, no_comb=False, refsites_only=False, refsites_all=False,
        no_hap=False, base_clip=0, aggre_model=AGGRE_CKPT, model_type="attbigru",
        seq_len=11, class_num=1, layer_rnn=1, hid_rnn=32, bin_size=20, cov_cf=4,
        only_close=False, discrete=False, tseed=1234,
    )
    for k, v in kw.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="module")
def modbam(tmp_path_factory):
    """Synthetic aligned BAM -> our call_mods -> modbam with HP tags."""
    tmp = tmp_path_factory.mktemp("freqdata")
    bam = str(tmp / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=30, read_len=400, ref_len=3000, seed=33)
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp, seed=17)
    cfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta, batch_size=128)
    out = call_mods_bam(cfg, bam, str(tmp / "mods"))
    # add HP tags
    rd = BamReader(out)
    recs = list(rd)
    rng = np.random.RandomState(0)
    for rec in recs:
        hap = int(rng.randint(0, 3))
        if hap:
            rec.set_tag("HP", "i", hap)
    tagged = str(tmp / "mods.hp.bam")
    with BamWriter(tagged, rd.header) as w:
        for rec in recs:
            w.write(rec)
    return SimpleNamespace(bam=tagged, refseq=refseq, fasta=fasta, recs=recs,
                           tmp=tmp)


def _oracle_bed(modbam_ns, args, chunk_len=1000, patch_zero_h0=False):
    ref_freq = _import_reference_freq()
    orig_init_hidden = None
    rm = None
    if patch_zero_h0:
        from tests.refmodels import import_reference_models

        rm = import_reference_models()
        orig_init_hidden = rm.AggrAttRNN.init_hidden
        rm.AggrAttRNN.init_hidden = lambda self, b, nl, h: torch.zeros(nl * 2, b, h)
    try:
        dnacontigs = {"chrS": modbam_ns.refseq}
        motifs_filter = None
        if args.refsites_only or args.refsites_all:
            motifs_filter = ["CG"]
        chunks = ref_freq._get_reference_chunks(dnacontigs, None, chunk_len, args.motifs)
        reader = FakeBamReader(modbam_ns.recs)
        all_, hp1, hp2 = [], [], []
        for chunk in chunks:
            a, b, c = ref_freq._readmods_to_bed_of_one_region(
                reader, chunk, dnacontigs, motifs_filter, args)
            all_ += a
            hp1 += b
            hp2 += c
        return all_, hp1, hp2
    finally:
        if orig_init_hidden is not None:
            rm.AggrAttRNN.init_hidden = orig_init_hidden


def _run_ours(modbam_ns, out_prefix, chunk_len=1000, **kw):
    cfg = FreqBamConfig(input_bam=modbam_ns.bam, ref=modbam_ns.fasta,
                        output=out_prefix, chunk_len=chunk_len, **kw)
    return call_mods_frequency_from_bamfile(cfg)


def _parse_freq_txt(path):
    rows = []
    for line in open(path):
        w = line.rstrip("\n").split("\t")
        rows.append((w[0], int(w[1]), w[3], w[6], w[7], w[8], w[9]))
    return rows


def _fmt_oracle(items):
    """Format oracle tuples with the reference's own _write_one_line."""
    ref_freq = _import_reference_freq()
    buf = io.StringIO()
    for item in items:
        ref_freq._write_one_line(item, buf, False)
    rows = []
    for line in buf.getvalue().splitlines():
        w = line.split("\t")
        rows.append((w[0], int(w[1]), w[3], w[6], w[7], w[8], w[9]))
    return rows


@pytest.mark.parametrize("kw", [
    dict(),
    dict(prob_cf=0.3),
    dict(prob_cf=0.3, no_amb_cov=True),
    dict(no_comb=True),
    dict(no_hap=True),
    dict(refsites_only=True),
    dict(refsites_all=True),
])
def test_count_mode_parity(modbam, tmp_path, kw):
    args = _ref_freq_args(**kw)
    oracle_all, oracle_hp1, oracle_hp2 = _oracle_bed(modbam, args)
    outs = _run_ours(modbam, str(tmp_path / "ours"), sort=True, **kw)
    out_all = [p for p in outs if ".all." in p]
    assert out_all, "no all output written"
    ours = _parse_freq_txt(out_all[0])
    want = sorted(_fmt_oracle(oracle_all), key=lambda x: (x[0], x[1], x[2]))
    ours_sorted = sorted(ours, key=lambda x: (x[0], x[1], x[2]))
    assert ours_sorted == want
    # haplotype outputs
    for tag, oracle_h in (("hp1", oracle_hp1), ("hp2", oracle_hp2)):
        out_h = [p for p in outs if ".{}.".format(tag) in p]
        if oracle_h:
            got = sorted(_parse_freq_txt(out_h[0]), key=lambda x: (x[0], x[1], x[2]))
            assert got == sorted(_fmt_oracle(oracle_h), key=lambda x: (x[0], x[1], x[2]))


def test_aggregate_mode_parity(modbam, tmp_path):
    args = _ref_freq_args(call_mode="aggregate")
    oracle_all, _h1, _h2 = _oracle_bed(modbam, args, patch_zero_h0=True)
    outs = _run_ours(modbam, str(tmp_path / "oursagg"), call_mode="aggregate",
                     aggre_model=AGGRE_CKPT, sort=True)
    out_all = [p for p in outs if ".all." in p]
    ours = sorted(_parse_freq_txt(out_all[0]), key=lambda x: (x[0], x[1], x[2]))
    want = sorted(_fmt_oracle(oracle_all), key=lambda x: (x[0], x[1], x[2]))
    assert len(ours) == len(want)
    n_diff = sum(1 for a, b in zip(ours, want) if a != b)
    # fp32 model outputs rounded to 6dp: allow a tiny number of borderline rounding
    # differences between torch and XLA accumulation orders
    assert n_diff <= max(1, len(want) // 200), "{} rows differ".format(n_diff)


def test_bed_format_output(modbam, tmp_path):
    outs = _run_ours(modbam, str(tmp_path / "bed"), bed=True, sort=True)
    out_all = [p for p in outs if ".all." in p][0]
    lines = open(out_all).read().splitlines()
    w = lines[0].split("\t")
    assert len(w) == 11
    assert int(w[1]) + 1 == int(w[2])
    assert w[8] == "0,0,0"
    assert 0 <= int(w[10]) <= 100


def test_gzip_output(modbam, tmp_path):
    import gzip

    outs = _run_ours(modbam, str(tmp_path / "gz"), gzip=True)
    assert all(p.endswith(".gz") for p in outs)
    with gzip.open([p for p in outs if ".all." in p][0], "rt") as f:
        assert len(f.read().splitlines()) > 10


def test_multiprocess_sharding_reconstructs_single_run(modbam, tmp_path):
    """Union of the per-process shard outputs == the single-process output
    (disjoint round-robin chunk ownership; chunk_len small so both shards own
    several chunks of the 3kb contig)."""
    outs_single = _run_ours(modbam, str(tmp_path / "single"), chunk_len=500)
    single = _parse_freq_txt([p for p in outs_single if ".all." in p][0])

    merged = []
    owned_counts = []
    for pid in range(2):
        outs = _run_ours(modbam, str(tmp_path / "shard{}".format(pid)),
                         chunk_len=500, num_processes=2, process_id=pid)
        out_all = [p for p in outs if ".all." in p]
        rows = _parse_freq_txt(out_all[0]) if out_all else []
        owned_counts.append(len(rows))
        merged.extend(rows)
    assert all(c > 0 for c in owned_counts), "both shards must emit sites"
    key = lambda x: (x[0], x[1], x[2])
    assert sorted(merged, key=key) == sorted(single, key=key)
    # disjoint ownership: no site emitted twice
    assert len(merged) == len({(r[0], r[1], r[2]) for r in merged})


def _strip_so(in_bam, out_bam):
    """Copy a BAM with the @HD SO: field removed (forces the full-scan path)."""
    from ccsmeth_tpu.bamio.bam import BamHeader

    rd = BamReader(in_bam)
    recs = list(rd)
    text = "\n".join("\t".join(f for f in ln.split("\t")
                               if not f.startswith("SO:"))
                     for ln in rd.header.text.splitlines())
    with BamWriter(out_bam, BamHeader(text + "\n", rd.header.references)) as w:
        for rec in recs:
            w.write(rec)


def test_streaming_equals_fullscan(modbam, tmp_path):
    """SO:coordinate inputs flush chunks during the scan (bounded read-level
    memory); outputs must be bit-identical to the full-scan path on the same
    records (header stripped of SO so the code cannot stream)."""
    assert "SO:coordinate" in BamReader(modbam.bam).header.text
    nosort = str(tmp_path / "noso.bam")
    _strip_so(modbam.bam, nosort)
    outs_stream = _run_ours(modbam, str(tmp_path / "st"), chunk_len=500)
    cfg = FreqBamConfig(input_bam=nosort, ref=modbam.fasta,
                        output=str(tmp_path / "fs"), chunk_len=500)
    outs_full = call_mods_frequency_from_bamfile(cfg)
    assert len(outs_stream) == len(outs_full) > 0
    for ps, pf in zip(sorted(outs_stream), sorted(outs_full)):
        assert open(ps).read() == open(pf).read()


def test_streaming_drains_accumulator(modbam):
    """The streaming scan must actually free flushed windows: after the pass
    (with every chunk flushed) the live accumulator holds zero sites."""
    from ccsmeth_tpu.pipeline.call_freq_bam import (
        get_reference_chunks, scan_bam_accumulate, _pop_chunk_tables)
    from ccsmeth_tpu.utils.fasta import DNAReference

    cfg = FreqBamConfig(input_bam=modbam.bam, ref=modbam.fasta, output="x",
                        chunk_len=500)
    dnacontigs = DNAReference(modbam.fasta).getcontigs()
    chunks = get_reference_chunks(dnacontigs, None, 500, "CG")
    from collections import deque

    dq = deque(chunks)
    live: dict = {}
    flushed = []

    def flush_cb(contig, frontier):
        while dq and (frontier is None or dq[0][2] + 2 <= frontier):
            c, s, e = dq.popleft()
            flushed.append(_pop_chunk_tables(live, c, s, e, True))

    scan_bam_accumulate(cfg, dnacontigs, None, None, None, flush_cb, live)
    while dq:
        c, s, e = dq.popleft()
        flushed.append(_pop_chunk_tables(live, c, s, e, True))
    n_left = sum(len(a.fwd) + len(a.rev) for a in live.values())
    assert n_left == 0, "accumulator holds {} undrained sites".format(n_left)
    assert sum(len(f) + len(r) for f, r in flushed) > 10
    # streaming flushed sites incrementally, not all at the end
    assert sum(1 for f, r in flushed if f or r) >= 3


def test_streaming_rejects_lying_sort_header(modbam, tmp_path):
    """A header claiming SO:coordinate over unsorted records must raise, not
    silently drop calls from already-flushed chunks."""
    rd = BamReader(modbam.bam)
    recs = list(rd)
    shuffled = str(tmp_path / "lying.bam")
    rng = np.random.RandomState(5)
    with BamWriter(shuffled, rd.header) as w:  # header still says coordinate
        for i in rng.permutation(len(recs)):
            w.write(recs[i])
    cfg = FreqBamConfig(input_bam=shuffled, ref=modbam.fasta,
                        output=str(tmp_path / "ly"), chunk_len=500)
    with pytest.raises(ValueError, match="not coordinate-sorted"):
        call_mods_frequency_from_bamfile(cfg)


def test_streaming_contig_order_independent(tmp_path):
    """Streaming flushes in BAM (header) contig order but assembles rows in
    ref_chunks (FASTA) order — outputs must be identical to the full-scan path
    even when the two orders disagree."""
    from ccsmeth_tpu.bamio.bam import BamHeader
    from tests.synth import make_synth_bam, write_fasta
    from tests.test_call_mods_e2e import _make_ckpt

    tmp = tmp_path
    bam_a = str(tmp / "a.bam")
    seq_a, _ = make_synth_bam(bam_a, n_reads=12, read_len=300, ref_len=1500,
                              seed=5)
    bam_b = str(tmp / "b.bam")
    seq_b, _ = make_synth_bam(bam_b, n_reads=12, read_len=300, ref_len=1500,
                              seed=6)
    # two contigs; BAM header order (chrB, chrA) != FASTA order (chrA, chrB)
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, {"chrA": seq_a, "chrB": seq_b})
    hdr = BamHeader("@SQ\tSN:chrB\tLN:1500\n@SQ\tSN:chrA\tLN:1500\n",
                    [("chrB", 1500), ("chrA", 1500)])
    recs = []
    for path, rid in ((bam_b, 0), (bam_a, 1)):  # BAM coordinate order: B then A
        for rec in BamReader(path):
            rec.ref_id = rid
            recs.append(rec)
    merged = str(tmp / "two.bam")
    with BamWriter(merged, hdr) as w:
        for rec in recs:
            w.write(rec)
    _tm, ckpt = _make_ckpt(tmp, seed=17)
    cfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta,
                         batch_size=128)
    modbam_path = call_mods_bam(cfg, merged, str(tmp / "mods"))
    assert "SO:coordinate" in BamReader(modbam_path).header.text
    nosort = str(tmp / "noso.bam")
    _strip_so(modbam_path, nosort)
    fc = FreqBamConfig(input_bam=modbam_path, ref=fasta,
                       output=str(tmp / "st"), chunk_len=400)
    outs_stream = call_mods_frequency_from_bamfile(fc)
    fc2 = FreqBamConfig(input_bam=nosort, ref=fasta,
                        output=str(tmp / "fs"), chunk_len=400)
    outs_full = call_mods_frequency_from_bamfile(fc2)
    assert len(outs_stream) == len(outs_full) > 0
    rows = 0
    for ps, pf in zip(sorted(outs_stream), sorted(outs_full)):
        a = open(ps).read()
        assert a == open(pf).read()
        rows += len(a.splitlines())
    assert rows > 10
    # both contigs present
    chroms = {ln.split("\t")[0] for p in outs_stream for ln in open(p)}
    assert chroms == {"chrA", "chrB"}


def test_scoped_shard_scan_reconstructs_single_run(modbam, tmp_path):
    """With a .bai present, share-nothing shards take the BAI-scoped read path
    (decode only owned spans) — shard-union must STILL equal the full run."""
    from ccsmeth_tpu.bamio.bai import build_index

    build_index(modbam.bam)
    try:
        outs_single = _run_ours(modbam, str(tmp_path / "single"), chunk_len=500)
        single = _parse_freq_txt([p for p in outs_single if ".all." in p][0])
        merged = []
        for pid in range(2):
            outs = _run_ours(modbam, str(tmp_path / "sc{}".format(pid)),
                             chunk_len=500, num_processes=2, process_id=pid)
            out_all = [p for p in outs if ".all." in p]
            if out_all:
                merged.extend(_parse_freq_txt(out_all[0]))
        key = lambda x: (x[0], x[1], x[2])
        assert sorted(merged, key=key) == sorted(single, key=key)
    finally:
        import os as _os

        _os.remove(modbam.bam + ".bai")  # module-scoped fixture: leave no .bai


def test_scoped_contigs_subset_equals_fullscan_rows(tmp_path):
    """--contigs on a multi-contig indexed BAM rides the BAI-scoped path and
    reproduces exactly the full run's rows for that contig."""
    from ccsmeth_tpu.bamio.bai import build_index
    from ccsmeth_tpu.bamio.bam import BamHeader
    from tests.synth import make_synth_bam, write_fasta
    from tests.test_call_mods_e2e import _make_ckpt

    bam_a = str(tmp_path / "a.bam")
    seq_a, _ = make_synth_bam(bam_a, n_reads=12, read_len=300, ref_len=1500,
                              seed=5)
    bam_b = str(tmp_path / "b.bam")
    seq_b, _ = make_synth_bam(bam_b, n_reads=12, read_len=300, ref_len=1500,
                              seed=6)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chrA": seq_a, "chrB": seq_b})
    hdr = BamHeader("@SQ\tSN:chrA\tLN:1500\n@SQ\tSN:chrB\tLN:1500\n",
                    [("chrA", 1500), ("chrB", 1500)])
    recs = []
    for path, rid in ((bam_a, 0), (bam_b, 1)):
        for rec in BamReader(path):
            rec.ref_id = rid
            recs.append(rec)
    merged = str(tmp_path / "two.bam")
    with BamWriter(merged, hdr) as w:
        for rec in recs:
            w.write(rec)
    _tm, ckpt = _make_ckpt(tmp_path, seed=17)
    mcfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta,
                          batch_size=128)
    bam = call_mods_bam(mcfg, merged, str(tmp_path / "mods"))
    build_index(bam)
    full = FreqBamConfig(input_bam=bam, ref=fasta,
                         output=str(tmp_path / "full"), chunk_len=700)
    outs_full = call_mods_frequency_from_bamfile(full)
    rows_full = _parse_freq_txt([p for p in outs_full if ".all." in p][0])
    sub = FreqBamConfig(input_bam=bam, ref=fasta, contigs="chrB",
                        output=str(tmp_path / "sub"), chunk_len=700)
    outs_sub = call_mods_frequency_from_bamfile(sub)
    rows_sub = _parse_freq_txt([p for p in outs_sub if ".all." in p][0])
    want = [r for r in rows_full if r[0] == "chrB"]
    assert rows_sub == want and len(want) > 0
