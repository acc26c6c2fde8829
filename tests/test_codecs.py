"""Unit tests for the pure codecs, checked against hand values and independent slow
re-derivations of the reference semantics (SURVEY.md §7 step 1)."""

import math

import numpy as np
import pytest

from ccsmeth_tpu.utils import codecs
from ccsmeth_tpu.utils.constants import BYTE2CODE


# --- CodecV1 ---------------------------------------------------------------------------


def _codecv1_slow():
    # independent re-derivation of the published CodecV1 spec
    code2frames = {}
    for i in range(0, 64):
        code2frames[i] = i
    frames = list(range(64, 191, 2))
    for i in range(64, 128):
        code2frames[i] = frames[i - 64]
    frames = list(range(192, 445, 4))
    for i in range(128, 192):
        code2frames[i] = frames[i - 128]
    frames = list(range(448, 953, 8))
    for i in range(192, 256):
        code2frames[i] = frames[i - 192]
    return code2frames


def test_codecv1_table_matches_spec():
    slow = _codecv1_slow()
    lut = codecs.codecv1_table()
    for code, frame in slow.items():
        assert lut[code] == frame
    assert lut[0] == 0 and lut[63] == 63
    assert lut[64] == 64 and lut[127] == 190
    assert lut[128] == 192 and lut[191] == 444
    assert lut[192] == 448 and lut[255] == 952


def test_codecv1_decode_array():
    arr = np.array([0, 63, 64, 65, 127, 128, 191, 192, 255], dtype=np.uint8)
    out = codecs.codecv1_decode(arr)
    assert out.tolist() == [0, 63, 64, 66, 190, 192, 444, 448, 952]


# --- sequence utils --------------------------------------------------------------------


def test_seq_to_code():
    assert codecs.seq_to_code("ACGTN").tolist() == [0, 1, 2, 3, 4]
    assert codecs.seq_to_code("acgtn").tolist() == [0, 1, 2, 3, 4]
    assert codecs.seq_to_code("WSRYX").tolist() == [4, 4, 4, 4, 4]


def test_complement_seq_reverses():
    # reference complement_seq returns the REVERSE complement
    assert codecs.complement_seq("ACGT") == "ACGT"
    assert codecs.complement_seq("AACG") == "CGTT"
    assert codecs.complement_seq("ANC") == "GNT"
    assert codecs.complement_seq("ACGU", "RNA") == "ACGU"


# --- motifs ----------------------------------------------------------------------------


def test_get_motif_seqs_iupac():
    assert codecs.get_motif_seqs("CG") == ["CG"]
    assert sorted(codecs.get_motif_seqs("CHH"))[:3] == sorted(
        [a + b + c for a in "C" for b in "ACT" for c in "ACT"]
    )[:3]
    assert len(codecs.get_motif_seqs("CHH")) == 9
    assert sorted(codecs.get_motif_seqs("CG,GC")) == ["CG", "GC"]


def test_motif_scan_equivalence():
    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(list("ACGTN"), size=500))
    for motifs, mod_loc in [(["CG"], 0), (["GATC"], 1), (["CAA", "CAT", "CAC"], 0)]:
        slow = codecs.get_refloc_of_methysite_in_motif(seq, set(motifs), mod_loc)
        fast = codecs.motif_hits(codecs.seq_to_bytes(seq), motifs, mod_loc)
        assert fast.tolist() == slow


# --- normalization ---------------------------------------------------------------------


def test_normalize_zscore():
    x = np.array([1, 2, 3, 4], dtype=np.int64)
    out = codecs.normalize_signals(x, "zscore")
    expected = np.around((x - x.mean()) / x.std(), 6)
    np.testing.assert_array_equal(out, expected)


def test_normalize_constant_input_gives_zeros():
    x = np.array([5, 5, 5])
    for m in ["zscore", "min-max", "mad"]:
        np.testing.assert_array_equal(codecs.normalize_signals(x, m), np.zeros(3))


def test_normalize_minmax_minmean_none():
    x = np.array([2, 4, 6, 8])
    np.testing.assert_array_equal(
        codecs.normalize_signals(x, "min-max"), np.around((x - 2) / 6.0, 6)
    )
    np.testing.assert_array_equal(
        codecs.normalize_signals(x, "min-mean"), np.around((x - 2) / 5.0, 6)
    )
    np.testing.assert_array_equal(codecs.normalize_signals(x, "none"), x)


def test_normalize_mad_matches_statsmodels_definition():
    x = np.array([1, 1, 2, 2, 4, 6, 9])
    med = np.median(x)
    mad = np.median(np.abs(x - med)) / 0.6744897501960817
    np.testing.assert_array_equal(
        codecs.normalize_signals(x, "mad"), np.around((x - med) / mad, 6)
    )


# --- CIGAR -----------------------------------------------------------------------------


def _q2r_slow(cigar, strand, seq_len):
    # independent slow re-derivation of megalodon parse_cigar semantics
    q_to_r = np.full(seq_len + 1, -2, dtype=np.int32)
    r, q = 0, 0
    ops = cigar if strand == 1 else cigar[::-1]
    for op, ln in ops:
        if op == 1:
            for qq in range(q, q + ln):
                q_to_r[qq] = -1
            q += ln
        elif op in (2, 3):
            r += ln
        elif op in (0, 7, 8):
            for k in range(ln):
                q_to_r[q + k] = r + k
            q += ln
            r += ln
    q_to_r[q] = r
    return q_to_r


@pytest.mark.parametrize("strand", [1, -1])
def test_q2r_from_cigar(strand):
    cigar = [(4, 3), (0, 5), (1, 2), (0, 4), (2, 3), (8, 2), (7, 1), (4, 2)]
    # aligned query length = 5+2+4+2+1 = 14
    got = codecs.get_q2tloc_from_cigar(cigar, strand, 14)
    want = _q2r_slow(cigar, strand, 14)
    np.testing.assert_array_equal(got, want)


def test_q2r_invalid_cigar_raises():
    with pytest.raises(ValueError):
        codecs.get_q2tloc_from_cigar([(1, 5)], 1, 10)


def test_compute_pct_identity():
    stats = np.zeros(11, dtype=np.int64)
    stats[0] = 90  # M
    stats[1] = 5  # I
    stats[2] = 5  # D
    stats[4] = 100  # S ignored
    assert codecs.compute_pct_identity(stats) == 0.9
    assert codecs.compute_pct_identity(np.zeros(11)) == 0.0


def test_parse_cigar_string_roundtrip():
    assert codecs.parse_cigar_string("3S5M2I4M3D2X1=") == [
        (4, 3), (0, 5), (1, 2), (0, 4), (2, 3), (8, 2), (7, 1)]
    assert codecs.parse_cigar_string("*") == []


def test_aligned_pairs_matches_only():
    cigar = [(4, 2), (0, 3), (1, 1), (0, 2), (2, 2), (0, 1)]
    pairs = codecs.aligned_pairs_from_cigar(cigar, ref_start=100, matches_only=True)
    # soft clip consumes q 0-1; M: q2,3,4 -> r100,101,102; I q5; M q6,7 -> r103,104;
    # D r105,106; M q8 -> r107
    want = [(2, 100), (3, 101), (4, 102), (6, 103), (7, 104), (8, 107)]
    assert pairs.tolist() == [list(x) for x in want]


def test_aligned_pairs_full():
    cigar = [(0, 2), (2, 1), (1, 1), (0, 1)]
    pairs = codecs.aligned_pairs_from_cigar(cigar, ref_start=10, matches_only=False)
    want = [(0, 10), (1, 11), (-1, 12), (2, -1), (3, 13)]
    assert pairs.tolist() == [list(x) for x in want]


# --- MM/ML -----------------------------------------------------------------------------


def _mm_slow(locs, seq):
    # slow re-derivation of _bam2modbam.py:187-203 semantics
    import re as _re

    base_alllocs = [i.start() for i in _re.finditer("C", seq)]
    base_orders = [-1] * len(locs)
    order_idx = 0
    for base_idx in range(len(base_alllocs)):
        try:
            if base_alllocs[base_idx] == locs[order_idx]:
                base_orders[order_idx] = base_idx
                order_idx += 1
        except IndexError:
            break
    assert base_orders[-1] != -1
    mm = [base_orders[0]]
    for i in range(1, len(base_orders)):
        mm.append(base_orders[i] - 1 - base_orders[i - 1])
    return mm


def test_convert_locs_to_mmtag():
    seq = "ACCGTCGACGTACGGC"
    locs = [2, 5, 12]
    got = codecs.convert_locs_to_mmtag(locs, codecs.seq_to_bytes(seq))
    assert got == _mm_slow(locs, seq)


def test_convert_locs_to_mmtag_bad_loc_raises():
    seq = "ACCGT"
    with pytest.raises(AssertionError):
        codecs.convert_locs_to_mmtag([3], codecs.seq_to_bytes(seq))  # pos 3 is T


def test_ml_roundtrip():
    probs = [0.0, 0.25, 0.5, 0.999, 1.0]
    ml = codecs.convert_probs_to_mltag(probs)
    assert ml == [0, 64, 128, math.floor(0.999 * 256), 255]
    assert codecs.ml_to_prob(0) == 0
    assert codecs.ml_to_prob(128) == round(0.5 + 1e-6, 6)


def test_parse_mm_tag():
    assert codecs.parse_mm_tag("C+m?,0,2,5;") == [0, 2, 5]
    assert codecs.parse_mm_tag("C+m,1,1;") == [1, 1]
    assert codecs.parse_mm_tag("A+a,3;") is None


def test_moddict_roundtrip_fwd_and_rev():
    seq = "ACCGTCGACGTACGGC"
    seq_bytes = codecs.seq_to_bytes(seq)
    locs = [2, 5, 12]
    probs = [0.9, 0.2, 0.75]
    mm = codecs.convert_locs_to_mmtag(locs, seq_bytes)
    ml = codecs.convert_probs_to_mltag(probs)
    # forward read
    d = codecs.moddict_from_mm_ml(mm, ml, seq_bytes, is_reverse=False)
    assert sorted(d.keys()) == locs
    for loc, p in zip(locs, probs):
        assert d[loc] == codecs.ml_to_prob(math.floor(p * 256))
    # reverse read: positions flip to seq_len-1-pos
    d = codecs.moddict_from_mm_ml(mm, ml, seq_bytes, is_reverse=True)
    assert sorted(d.keys()) == sorted(len(seq) - 1 - np.array(locs))


def test_byte2code_table_covers_iupac():
    for ch in "WSMKRYBVDHZ":
        assert BYTE2CODE[ord(ch)] == 4
