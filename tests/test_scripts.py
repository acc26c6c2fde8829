"""Smoke + correctness tests for the offline scripts tier (SURVEY.md §2.8)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.synth import make_synth_bam, write_fasta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}


def run_script(name, *args, cwd=SCRIPTS):
    out = subprocess.run([sys.executable, os.path.join(SCRIPTS, name), *args],
                         capture_output=True, text=True, env=ENV, cwd=cwd,
                         timeout=300)
    assert out.returncode == 0, "{} failed:\n{}\n{}".format(name, out.stdout,
                                                            out.stderr)
    return out.stdout


def _write_per_readsite(path, n=60, seed=0):
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for i in range(n):
            p1 = round(float(rng.rand()), 6)
            p0 = round(1 - p1, 6)
            f.write("\t".join([
                "chr1", str(100 + 2 * (i % 20)), "+" if i % 3 else "-",
                "m0/{}/ccs".format(i % 10), str(i), "9,8", str(p0), str(p1),
                "1" if p1 > 0.5 else "0", "ACGCG"]) + "\n")


def _write_features(path, n=50, seed=1):
    rng = np.random.RandomState(seed)
    kmers = ["ACGTACGTACCGGTACGTACG", "TTGCACGTACCGGTACGTACG"]
    with open(path, "w") as f:
        for i in range(n):
            k = kmers[i % 2]
            vec = ",".join(str(round(x, 6)) for x in rng.randn(21))
            f.write("\t".join(["chr1", str(1000 + i), "+", "r/{}/ccs".format(i),
                               str(i), k, "9", vec, ".", vec, ".", ".", ".",
                               k[::-1], "8", vec, ".", vec, ".", ".", ".",
                               str(i % 2)]) + "\n")


def test_generate_train_valid_files(tmp_path):
    f = str(tmp_path / "f.tsv")
    _write_features(f, n=100)
    run_script("generate_train_valid_files.py", "--feature_file", f,
               "--wprefix", str(tmp_path / "s"), "--valid_ratio", "0.2")
    tr = open(str(tmp_path / "s.train.tsv")).read().splitlines()
    va = open(str(tmp_path / "s.valid.tsv")).read().splitlines()
    assert len(tr) == 80 and len(va) == 20


def test_concat_two_files(tmp_path):
    f1 = str(tmp_path / "a.tsv")
    f2 = str(tmp_path / "b.tsv")
    _write_features(f1, n=30, seed=1)
    _write_features(f2, n=20, seed=2)
    out = str(tmp_path / "c.tsv")
    run_script("concat_two_files.py", "--fp1", f1, "--fp2", f2,
               "--concated_fp", out, "--shuffle_lines_num", "7")
    assert len(open(out).read().splitlines()) == 50


def test_randsel_and_shuffle(tmp_path):
    f = str(tmp_path / "f.tsv")
    _write_features(f, n=100)
    out = str(tmp_path / "sel.tsv")
    run_script("randsel_file_rows.py", "--ori_filepath", f,
               "--write_filepath", out, "--num_lines", "25")
    assert len(open(out).read().splitlines()) == 25
    out2 = str(tmp_path / "shuf.tsv")
    run_script("shuffle_a_big_file.py", "--fp", f, "--wfp", out2,
               "--lines_per_chunk", "30")
    lines = open(out2).read().splitlines()
    assert sorted(lines) == sorted(open(f).read().splitlines())


def test_balance_and_shrink_and_depth(tmp_path):
    f = str(tmp_path / "f.tsv")
    _write_features(f, n=60)
    out = str(tmp_path / "bal.tsv")
    run_script("balance_samples_of_kmer_in_feature_file.py", "--feafile", f,
               "--kmer_feafile", f, "--wfile", out)
    assert len(open(out).read().splitlines()) > 0
    out2 = str(tmp_path / "k15.tsv")
    run_script("shrink_kmer_length_of_features.py", "-i", f, "--klen", "15",
               "-o", out2)
    w = open(out2).readline().split("\t")
    assert len(w[5]) == 15 and len(w[7].split(",")) == 15
    out3 = str(tmp_path / "d.tsv")
    run_script("filter_features_by_depth.py", "-i", f, "-o", out3, "--depth", "5")
    assert len(open(out3).read().splitlines()) == 60


def test_eval_and_sampleids(tmp_path):
    pos = str(tmp_path / "pos.tsv")
    neg = str(tmp_path / "neg.tsv")
    _write_per_readsite(pos, seed=3)
    _write_per_readsite(neg, seed=4)
    res = str(tmp_path / "res.tsv")
    run_script("eval_at_readlevel.py", "--unmethylated", neg, "--methylated", pos,
               "--depth_cf", "1", "--prob_cf", "0.0", "--round", "2",
               "--result_file", res)
    lines = open(res).read().splitlines()
    assert lines[0].startswith("tested_type") and len(lines) > 1
    run_script("get_sampleids_from_predfile.py", "--idsrc", pos)
    assert os.path.exists(str(tmp_path / "pos.sampleids.txt"))


def test_freq_converters(tmp_path):
    freq = str(tmp_path / "freq.txt")
    with open(freq, "w") as f:
        for i, (strand, met, unmet) in enumerate([("+", 5, 1), ("-", 2, 4),
                                                  ("+", 3, 3)]):
            pos = 100 + i
            cov = met + unmet
            f.write("chr1\t{}\t{}\t{}\t{:.3f}\t{:.3f}\t{}\t{}\t{}\t{:.4f}\tACGCG\n"
                    .format(pos, pos + 1, strand, 0.3 * cov, 0.7 * cov, met, unmet,
                            cov, met / cov))
    run_script("freq2bedmethyl.py", "--freqfile", freq, "--sort")
    bed = str(tmp_path / "freq.bed")
    rows = [line.split("\t") for line in open(bed).read().splitlines()]
    assert len(rows) == 3 and rows[0][8] == "0,0,0"
    out = str(tmp_path / "comb.tsv")
    run_script("comb_two_strands_of_methylfreq.py", "--report_fp", freq,
               "--wfile", out)
    lines = open(out).read().splitlines()
    # pos 101(-) combines into 100(+); 102 stays
    assert len(lines) == 2
    w = lines[0].split("\t")
    assert w[1] == "100" and int(w[8]) == 12  # cov 6 + 6
    out2 = str(tmp_path / "combined.freq.txt")
    run_script("combine_call_mods_freq_files.py", "-i", freq, "-i", freq,
               "-o", out2, "--sort")
    w = open(out2).readline().split("\t")
    assert int(w[8]) == 12  # doubled coverage


def test_per_read_modscall_and_modbam(tmp_path):
    pr = str(tmp_path / "pr.tsv")
    _write_per_readsite(pr)
    out = str(tmp_path / "pr.per_read.bed")
    run_script("generate_per_read_modscall.py", "-i", pr, "-o", out)
    lines = open(out).read().splitlines()
    assert lines
    w = lines[0].split("\t")
    assert int(w[3]) == len(w[4].split(","))


def test_split_bam_and_bam2fq(tmp_path):
    bam = str(tmp_path / "t.bam")
    make_synth_bam(bam, n_reads=10, read_len=100, ref_len=1000)
    holes = str(tmp_path / "holes.txt")
    with open(holes, "w") as f:
        f.write("m0/0/ccs\nm0/1/ccs\n")
    sel = str(tmp_path / "sel.bam")
    rest = str(tmp_path / "rest.bam")
    out = run_script("split_subreadsbam_by_holeids.py", "-i", bam,
                     "--holeids", holes, "--out_selected", sel,
                     "--out_rest", rest)
    assert "selected 2 reads, rest 8" in out
    fq = str(tmp_path / "t.fq")
    run_script("subreads_bam2fq.py", "-i", bam, "-o", fq)
    lines = open(fq).read().splitlines()
    assert len(lines) == 40 and lines[0].startswith("@m0/0/ccs")
    # split fastq
    run_script("split_fastq_by_holeids.py", "-i", fq, "--holeids", holes,
               "--out_selected", str(tmp_path / "sel.fq"))
    assert len(open(str(tmp_path / "sel.fq")).read().splitlines()) == 8


def test_phase_and_dmr(tmp_path):
    # haplotagged bam
    from ccsmeth_tpu.bamio import BamReader, BamWriter

    bam = str(tmp_path / "h.bam")
    make_synth_bam(bam, n_reads=10, read_len=100, ref_len=1000)
    rd = BamReader(bam)
    recs = list(rd)
    for i, r in enumerate(recs):
        r.set_tag("HP", "i", 1 + (i % 2))
    tagged = str(tmp_path / "h.hp.bam")
    with BamWriter(tagged, rd.header) as w:
        for r in recs:
            w.write(r)
    pr = str(tmp_path / "calls.tsv")
    with open(pr, "w") as f:
        for i, r in enumerate(recs):
            f.write("\t".join(["chrS", str(100 + i), "+", r.qname, "5", "9,9",
                               "0.2", "0.8", "1", "ACGCG"]) + "\n")
    out = run_script("hap/phase_methyl_calls.py", "-i", pr, "--bam", tagged,
                     "--all_contigs", "--mapq", "0")
    assert "hp1: 5 rows, hp2: 5 rows" in out
    # per-hap freq
    run_script("hap/call_modification_frequency.py", "-i",
               str(tmp_path / "calls.hp1.tsv"), "-o", str(tmp_path / "hapfreq"),
               "--sort")
    assert os.path.exists(str(tmp_path / "hapfreq.hp1.freq.txt"))
    # DMR: construct two freq files with a strong difference
    hp1 = str(tmp_path / "m1.freq.txt")
    hp2 = str(tmp_path / "m2.freq.txt")
    with open(hp1, "w") as f1, open(hp2, "w") as f2:
        for i in range(50):
            pos = 1000 + i * 20
            # hp1 fully methylated, hp2 unmethylated in a central block
            m1, c1 = 10, 10
            m2 = 0 if 10 <= i < 30 else 10
            c2 = 10
            f1.write("chr1\t{}\t{}\t+\t1.0\t9.0\t{}\t{}\t{}\t{:.4f}\tACGCG\n"
                     .format(pos, pos + 1, m1, c1 - m1, c1, m1 / c1))
            f2.write("chr1\t{}\t{}\t+\t5.0\t5.0\t{}\t{}\t{}\t{:.4f}\tACGCG\n"
                     .format(pos, pos + 1, m2, c2 - m2, c2, m2 / c2))
    dmr = str(tmp_path / "dmr.tsv")
    run_script("hap/call_dmr.py", "--hp1", hp1, "--hp2", hp2, "-o", dmr,
               "--smooth_span", "50")
    lines = open(dmr).read().splitlines()
    assert len(lines) >= 2  # header + >=1 DMR
    w = lines[1].split("\t")
    assert float(w[6]) > 0.5  # hp1 - hp2 delta positive in the DMR
    # the called region must cover the engineered differential block
    assert int(w[1]) <= 1000 + 10 * 20 and int(w[2]) >= 1000 + 29 * 20


def test_bam2bisbam(tmp_path):
    """Reference-space bis conversion: CpG sites become kept-C (methylated),
    T/A (unmethylated), or N (uncalled); output carries the ref span with an
    all-M cigar and HP from call-file membership (bam2bisbam.py:201-234)."""
    from ccsmeth_tpu.bamio import BamReader

    bam = str(tmp_path / "b.bam")
    refseq, _ = make_synth_bam(bam, n_reads=4, read_len=100, ref_len=1000)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    recs = list(BamReader(bam))
    # per-read calls at REF positions: first CpG in span methylated, second
    # unmethylated; the rest uncalled
    import re as _re

    pr1 = str(tmp_path / "c1.tsv")
    expected = {}
    with open(pr1, "w") as f:
        for r in recs:
            span = refseq[r.pos : r.reference_end]
            cpgs = [m.start() + r.pos for m in _re.finditer("CG", span)]
            if len(cpgs) < 3:
                continue
            f.write("\t".join(["chrS", str(cpgs[0]), "+", r.qname, "0",
                               "9,9", "0.1", "0.9", "1", "ACGCG"]) + "\n")
            f.write("\t".join(["chrS", str(cpgs[1]), "+", r.qname, "0",
                               "9,9", "0.9", "0.1", "0", "ACGCG"]) + "\n")
            expected[r.qname] = (cpgs[0], cpgs[1], cpgs[2])
    pr2 = str(tmp_path / "c2.tsv")
    open(pr2, "w").close()
    out = run_script("hap/bam2bisbam.py", "--haped_bam", bam,
                     "--haped_tsv1", pr1, "--haped_tsv2", pr2,
                     "--ref", fasta, "--outprefix", str(tmp_path / "bis"))
    assert "hp1:" in out
    bis = {r.qname: r for r in BamReader(str(tmp_path / "bis.hp1bis.bam"))}
    assert len(bis) == len(expected) > 0
    for orig in recs:
        if orig.qname not in expected:
            continue
        conv = bis[orig.qname]
        meth, unmeth, uncalled = expected[orig.qname]
        off = 1 if orig.is_reverse else 0
        unmod = "A" if orig.is_reverse else "T"
        assert conv.pos == orig.pos
        assert conv.cigar == [(0, orig.reference_end - orig.pos)]
        s = conv.seq
        assert s[meth - orig.pos + off] == ("G" if orig.is_reverse else "C")
        assert s[unmeth - orig.pos + off] == unmod
        assert s[uncalled - orig.pos + off] == "N"
        assert conv.get_tag("HP") == 1
    # hp2 file empty -> no reads
    assert not os.path.exists(str(tmp_path / "bis.hp2bis.bam")) or         len(list(BamReader(str(tmp_path / "bis.hp2bis.bam")))) == 0


def test_unzip_model_ckpt_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_call_mods_e2e import _make_ckpt

    _tm, ckpt = _make_ckpt(tmp_path)
    out = str(tmp_path / "model.npz")
    run_script("unzip_model_ckpt.py", "--model_file", ckpt, "-o", out)
    assert os.path.exists(out)
    txt = run_script("unzip_model_ckpt.py", "--model_file", out)
    assert "embed" in txt


def test_correlation_scripts(tmp_path):
    # build two correlated bedMethyl files
    rng = np.random.RandomState(0)
    bs = str(tmp_path / "bs.bed")
    sm = str(tmp_path / "sm.freq.txt")
    with open(bs, "w") as f1, open(sm, "w") as f2:
        for i in range(200):
            pos = 1000 + i * 2
            r = float(rng.rand())
            r2 = min(max(r + rng.randn() * 0.05, 0), 1)
            f1.write("chr1\t{}\t{}\t.\t10\t+\t{}\t{}\t0,0,0\t10\t{}\n".format(
                pos, pos + 1, pos, pos + 1, int(round(r * 100))))
            met = int(round(r2 * 10))
            f2.write("chr1\t{}\t{}\t+\t3.0\t7.0\t{}\t{}\t10\t{:.4f}\tACGCG\n"
                     .format(pos, pos + 1, met, 10 - met, met / 10))
    out = run_script("correlation_with_bs.py", "--bs_file", bs,
                     "--smrt_file", sm, "--bs_cov_cf", "1", "--cov_cf", "1")
    row = out.strip().splitlines()[-1].split("\t")
    assert float(row[2]) > 0.9  # pearson
    out2 = run_script("correlation_with_any.py", "--file_a", bs, "--file_b", sm,
                      "--cov_cf_a", "1", "--cov_cf_b", "1")
    assert float(out2.strip().splitlines()[-1].split("\t")[2]) > 0.9
    out3 = run_script("correlation_with_bs_coverage_effect.py", "--bs_file", bs,
                      "--smrt_file", sm, "--bs_cov_cf", "1")
    assert "cov_bin" in out3
    data_out = str(tmp_path / "pairs.tsv")
    run_script("correlation_with_any_data.py", "--file_a", bs, "--file_b", sm,
               "-o", data_out, "--cov_cf_a", "1", "--cov_cf_b", "1")
    assert len(open(data_out).read().splitlines()) > 100


def test_filter_positions_scripts(tmp_path):
    pr = str(tmp_path / "pr.tsv")
    _write_per_readsite(pr)
    posf = str(tmp_path / "pos.tsv")
    with open(posf, "w") as f:
        f.write("chr1\t100\nchr1\t102\n")
    out = str(tmp_path / "kept.tsv")
    run_script("filter_call_mods_by_positions.py", "-i", pr, "-p", posf, "-o", out)
    kept = open(out).read().splitlines()
    assert kept and all(line.split("\t")[1] in ("100", "102") for line in kept)
    f = str(tmp_path / "feat.tsv")
    _write_features(f, n=20)
    posf2 = str(tmp_path / "pos2.tsv")
    with open(posf2, "w") as fh:
        fh.write("chr1\t1000\nchr1\t1001\n")
    run_script("filter_features_by_positions.py", "--sf_path", f, "-p", posf2)
    out_f = str(tmp_path / "feat.filtered.tsv")
    assert len(open(out_f).read().splitlines()) == 2


def test_aggre_train_data_pipeline(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_call_mods_e2e import _make_ckpt
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=20, read_len=300, ref_len=2000, seed=5)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)
    modbam = call_mods_bam(
        CallModsConfig(model_file=ckpt, mode="align", ref=fasta, batch_size=64),
        bam, str(tmp_path / "m"))
    # default: the reference's 10-column per-read-site format
    per_read = str(tmp_path / "perread.tsv")
    run_script("call_mods_freq_bam_per_readsite.py", "-i", modbam, "--ref", fasta,
               "-o", per_read)
    rlines = open(per_read).read().splitlines()
    assert rlines
    rw = rlines[0].split("\t")
    assert len(rw) == 10 and rw[4] == "-1" and rw[5] == "1,1" and rw[9] == "-"
    assert abs(float(rw[6]) + float(rw[7]) - 1.0) < 1e-9
    assert rw[8] in ("0", "1")
    # --sitelist: compact per-site rows
    per_site = str(tmp_path / "persite.tsv")
    run_script("call_mods_freq_bam_per_readsite.py", "-i", modbam, "--ref", fasta,
               "-o", per_site, "--sitelist")
    lines = open(per_site).read().splitlines()
    assert lines
    w = lines[0].split("\t")
    assert int(w[3]) == len(w[4].split(","))
    # both formats carry the same probs per site
    from collections import defaultdict
    agg = defaultdict(list)
    for ln in rlines:
        f = ln.split("\t")
        agg[(f[0], f[1], f[2])].append(round(float(f[7]), 6))
    for ln in lines:
        f = ln.split("\t")
        assert sorted(agg[(f[0], f[1], f[2])]) == sorted(
            round(float(x), 6) for x in f[4].split(","))
    # BS truth covering those sites
    bs = str(tmp_path / "bs.bed")
    with open(bs, "w") as f:
        for line in lines:
            w = line.split("\t")
            f.write("chrS\t{}\t{}\t.\t10\t+\t{}\t{}\t0,0,0\t10\t50\n".format(
                w[1], int(w[1]) + 1, w[1], int(w[1]) + 1))
    out = str(tmp_path / "aggre.tsv")
    run_script("generate_aggre_train_data.py", "-i", per_site, "--bs_bed", bs,
               "-o", out, "--cov_cf", "1", "--bs_cov_cf", "1")
    rows = open(out).read().splitlines()
    assert rows
    w = rows[0].split("\t")
    assert len(w) == 7
    assert len(w[4].split(";")) == 11  # 11-site histogram windows
    # 10-column input produces the identical training rows
    out2 = str(tmp_path / "aggre2.tsv")
    run_script("generate_aggre_train_data.py", "-i", per_read, "--bs_bed", bs,
               "-o", out2, "--cov_cf", "1", "--bs_cov_cf", "1")
    assert open(out2).read() == open(out).read()
