"""BAI index build + region fetch: fetch results must equal a brute-force scan."""

import numpy as np
import pytest

from ccsmeth_tpu.bamio import BamReader
from ccsmeth_tpu.bamio.bai import BaiIndex, build_index, fetch_region, index_bam_if_needed

from tests.synth import make_synth_bam


@pytest.fixture(scope="module")
def sorted_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bai")
    p = str(tmp / "s.bam")
    make_synth_bam(p, n_reads=80, read_len=300, ref_len=20000, seed=42)
    return p


def _brute_force(bam, start, stop):
    out = []
    for rec in BamReader(bam):
        if rec.is_unmapped or rec.ref_id != 0:
            continue
        if rec.pos < stop and rec.reference_end > start:
            out.append(rec.qname)
    return out


def test_build_and_parse_index(sorted_bam):
    bai = build_index(sorted_bam)
    idx = BaiIndex(bai)
    assert idx.n_ref == 1
    bins, linear = idx.refs[0]
    assert bins and len(linear) > 0


@pytest.mark.parametrize("region", [(0, 1000), (5000, 6000), (9990, 10310),
                                    (0, 20000), (19990, 20000)])
def test_fetch_matches_brute_force(sorted_bam, region):
    start, stop = region
    got = sorted(r.qname for r in fetch_region(sorted_bam, "chrS", start, stop))
    want = sorted(_brute_force(sorted_bam, start, stop))
    assert got == want


def test_fetch_unknown_contig(sorted_bam):
    assert list(fetch_region(sorted_bam, "chrX", 0, 100)) == []


def test_index_if_needed(sorted_bam, tmp_path):
    import os
    import shutil

    p = str(tmp_path / "c.bam")
    shutil.copy(sorted_bam, p)
    out = index_bam_if_needed(p)
    assert out.endswith(".bai") and os.path.exists(out)
    # second call is a no-op
    mtime = os.path.getmtime(out)
    assert index_bam_if_needed(p) == out
    assert os.path.getmtime(out) == mtime


def test_unsorted_bam_rejected(tmp_path):
    from ccsmeth_tpu.bamio import BamWriter

    p = str(tmp_path / "u.bam")
    src = str(tmp_path / "src.bam")
    make_synth_bam(src, n_reads=10, read_len=100, ref_len=2000, seed=1)
    rd = BamReader(src)
    recs = list(rd)
    recs.reverse()
    with BamWriter(p, rd.header) as w:
        for r in recs:
            w.write(r)
    with pytest.raises(ValueError, match="not coordinate-sorted"):
        build_index(p)


def test_fetch_wide_coordinate_multiblock(tmp_path):
    """Stress: reads tiled over 5Mb (hundreds of 16kb BAI windows, multiple
    BGZF blocks); fetches across window boundaries equal brute force."""
    p = str(tmp_path / "wide.bam")
    make_synth_bam(p, n_reads=600, read_len=2000, ref_len=5_000_000, seed=9)
    build_index(p)
    for start, stop in [(0, 10_000), (16_000, 17_000), (2_500_000, 2_600_000),
                        (4_990_000, 5_000_000), (0, 5_000_000)]:
        got = sorted(r.qname for r in fetch_region(p, "chrS", start, stop))
        want = sorted(_brute_force(p, start, stop))
        assert got == want, (start, stop, len(got), len(want))


def test_fetch_scoped_multi_span_dedup(sorted_bam, tmp_path):
    """fetch_scoped yields every record exactly once even when spans overlap
    or a read straddles adjacent spans; missing .bai raises (no build race)."""
    from ccsmeth_tpu.bamio.bai import fetch_scoped

    build_index(sorted_bam)
    # overlapping + adjacent spans covering [2000, 12000)
    spans = [(2000, 6000), (5500, 9000), (9000, 12000)]
    got = [r.qname for r in fetch_scoped(sorted_bam, {"chrS": spans})]
    assert len(got) == len(set(got)), "duplicate records across spans"
    assert sorted(got) == sorted(_brute_force(sorted_bam, 2000, 12000))

    import shutil

    nobai = str(tmp_path / "nobai.bam")
    shutil.copy(sorted_bam, nobai)
    with pytest.raises(FileNotFoundError):
        list(fetch_scoped(nobai, {"chrS": [(0, 100)]}))


def test_build_index_streams_bounded_memory(tmp_path):
    """build_index must stream — peak traced memory stays at ~span scale,
    NOT O(file): the htslib `samtools index` behavior being replaced. A
    ~17 MB-decompressed BAM indexed with 256 KiB compressed spans must peak
    far below the file size, and the resulting index must serve fetches."""
    import tracemalloc

    p = str(tmp_path / "big.bam")
    make_synth_bam(p, n_reads=1000, read_len=2000, ref_len=4_000_000, seed=3)
    tracemalloc.start()
    tracemalloc.reset_peak()
    bai = build_index(p, span_bytes=256 << 10)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 6 << 20, "build_index peak {} bytes: not streaming".format(peak)
    BaiIndex(bai)  # parses
    got = [r.qname for r in fetch_region(p, "chrS", 1_000_000, 1_400_000)]
    want = _brute_force(p, 1_000_000, 1_400_000)
    assert got == want and len(got) > 10


def test_build_index_bounded_memory_compressible_bam(tmp_path):
    """The streaming bound must hold in DECOMPRESSED terms too: a
    low-complexity BAM (homopolymer reads, BGZF ratio ~100-600x) framed by
    compressed span_bytes alone would materialize ~ratio x span in one
    decompress call (advisor r4 finding — 96.7 MB peak at a 256 KiB span
    pre-fix). The span framing must also cut on cumulative ISIZE."""
    import tracemalloc

    import numpy as np

    from ccsmeth_tpu.bamio.bam import BamHeader, BamRecord, BamWriter

    p = str(tmp_path / "lowc.bam")
    # ~30 MB decompressed of near-identical homopolymer records -> BGZF
    # compresses them ~100x
    header = BamHeader("@SQ\tSN:chrS\tLN:4000000\n", [("chrS", 4_000_000)])
    seq = "A" * 4000
    qual = np.full(4000, 40, np.uint8)
    with BamWriter(p, header) as w:
        for i in range(7_000):
            w.write(BamRecord(qname="r{:06d}".format(i), flag=0, ref_id=0,
                              pos=100 + i * 300, mapq=60,
                              cigar=[(0, 4000)], seq=seq, qual=qual))
    import os as _os

    csize = _os.path.getsize(p)
    assert csize < 4 << 20, csize  # genuinely compressible fixture
    tracemalloc.start()
    tracemalloc.reset_peak()
    bai = build_index(p, span_bytes=256 << 10)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # 4x span decompressed cap + trimming slack; pre-fix this peaked ~97 MB
    assert peak < 12 << 20, "build_index peak {} bytes on compressible BAM".format(peak)
    idx = BaiIndex(bai)
    assert idx is not None
    got = [r.qname for r in fetch_region(p, "chrS", 200_000, 260_000)]
    assert got and all(q.startswith("r") for q in got)
