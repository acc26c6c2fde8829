"""Native multithreaded BGZF codec: correctness vs the pure-Python path and
stdlib gzip, plus transparent reader/writer integration."""

import gzip

import numpy as np
import pytest

from ccsmeth_tpu.bamio.bgzf import BgzfReader, BgzfWriter
from ccsmeth_tpu.bamio.native import (
    compress_bgzf_bytes,
    decompress_bgzf_bytes,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec not built")


def _payload(n=3_000_000, seed=0):
    rng = np.random.RandomState(seed)
    compressible = np.frombuffer(b"ACGT" * (n // 8 + 1), dtype=np.uint8)[: n // 2]
    random = rng.randint(0, 256, n - n // 2, dtype=np.uint8)
    return compressible.tobytes() + random.tobytes()


def test_native_compress_python_read(tmp_path):
    data = _payload()
    comp = compress_bgzf_bytes(data)
    assert comp is not None
    p = str(tmp_path / "n.bgzf")
    from ccsmeth_tpu.bamio.bgzf import BGZF_EOF

    with open(p, "wb") as f:
        f.write(comp + BGZF_EOF)
    # stdlib gzip cross-check
    with gzip.open(p, "rb") as g:
        assert g.read() == data
    # pure python reader (native bulk path disabled)
    r = BgzfReader(p, use_native=False)
    assert r.read() == data


def test_python_compress_native_read(tmp_path):
    data = _payload(seed=1)
    p = str(tmp_path / "p.bgzf")
    with BgzfWriter(p, use_native=False) as w:
        w.write(data)
    raw = open(p, "rb").read()
    out = decompress_bgzf_bytes(raw)
    assert out == data


def test_native_roundtrip_through_reader_writer(tmp_path):
    data = _payload(n=20_000_000, seed=2)
    p = str(tmp_path / "rt.bgzf")
    with BgzfWriter(p) as w:  # native span compression
        for i in range(0, len(data), 1 << 20):
            w.write(data[i : i + (1 << 20)])
    r = BgzfReader(p)  # native bulk decompression
    assert r.read() == data


def test_native_bam_pipeline(tmp_path):
    """A BAM written+read through the native codec parses identically."""
    from ccsmeth_tpu.bamio import BamReader

    from tests.synth import make_synth_bam

    p = str(tmp_path / "n.bam")
    make_synth_bam(p, n_reads=25, read_len=500, ref_len=20000, seed=3)
    recs_native = list(BamReader(p))
    # re-read with python-only reader
    import ccsmeth_tpu.bamio.bam as bam_mod

    rd = bam_mod.BamReader.__new__(bam_mod.BamReader)
    from ccsmeth_tpu.bamio.bgzf import BgzfReader as BR
    import struct

    rd.path = p
    rd._sam = None
    rd._bgzf = BR(p, use_native=False)
    magic = rd._bgzf.read_exact(4)
    assert magic == b"BAM\x01"
    (l_text,) = struct.unpack("<i", rd._bgzf.read_exact(4))
    rd._bgzf.read_exact(l_text)
    (n_ref,) = struct.unpack("<i", rd._bgzf.read_exact(4))
    refs = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", rd._bgzf.read_exact(4))
        name = rd._bgzf.read_exact(l_name)[:-1].decode()
        (l_ref,) = struct.unpack("<i", rd._bgzf.read_exact(4))
        refs.append((name, l_ref))
    rd.header = bam_mod.BamHeader("", refs)
    recs_py = list(rd)
    assert len(recs_native) == len(recs_py)
    for a, b in zip(recs_native, recs_py):
        assert a.qname == b.qname and a.seq == b.seq and a.cigar == b.cigar


def test_native_rejects_garbage():
    assert decompress_bgzf_bytes(b"not a bgzf stream at all") is None


def test_native_span_decompressed_cap_pathological_ratio(tmp_path):
    """A highly compressible stream (constant bytes: ~600x BGZF ratio) must
    not blow the native reader's resident buffer past ~4x the compressed
    span: the span framing cuts on cumulative ISIZE, not just compressed
    bytes (bgzf.py _complete_prefix_len max_decompressed)."""
    from ccsmeth_tpu.bamio.bgzf import BgzfReader, BgzfWriter

    p = str(tmp_path / "zeros.bgzf")
    payload = bytes(64 << 20)  # 64 MB of zeros -> ~130 KB compressed
    with BgzfWriter(p, compresslevel=6) as w:
        w.write(payload)
    import os as _os

    assert _os.path.getsize(p) < 256 << 10
    rd = BgzfReader(p, span_bytes=4096)
    if rd._native is None:
        rd.close()
        import pytest as _pytest

        _pytest.skip("native codec unavailable")
    got = bytearray()
    max_buf = 0
    max_tail = 0
    while True:
        chunk = rd.read(1 << 20)
        if not chunk:
            break
        got += chunk
        max_buf = max(max_buf, len(rd._buf))
        max_tail = max(max_tail, len(rd._tail))
    rd.close()
    assert bytes(got) == payload
    # 4x compressed span + one 64 KiB block of slack
    assert max_buf <= 4 * 4096 + (64 << 10), max_buf
    # the COMPRESSED carry between spans must stay bounded too: when the
    # decompressed cap leaves a tail that already frames whole blocks, the
    # next refill must drain it instead of reading span more bytes — else
    # the tail grows toward O(compressed file) on ratios > 4x (advisor r4)
    assert max_tail <= 2 * 4096 + (64 << 10), max_tail
