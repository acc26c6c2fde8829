"""Pipeline runs on the REAL demo reference sequence (hg002 chr20 demo region) —
real genomic sequence context instead of synthetic DNA, plus the BS-seq truth file
format as consumed by the correlation tooling."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DEMO_FA = "/root/reference/demo/chr20_demo.fa"
DEMO_BS = "/root/reference/demo/hg002_bsseq_chr20_demo.bed"

pytestmark = pytest.mark.skipif(not os.path.exists(DEMO_FA),
                                reason="demo fasta not present")


def test_call_mods_and_freqb_on_demo_reference(tmp_path):
    """Simulated HiFi reads drawn from the real chr20 demo sequence through the
    full call_mods -> call_freqb path."""
    from ccsmeth_tpu.bamio import BamHeader, BamReader, BamWriter
    from ccsmeth_tpu.pipeline.call_freq_bam import (FreqBamConfig,
                                                    call_mods_frequency_from_bamfile)
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam
    from ccsmeth_tpu.utils.codecs import complement_seq
    from ccsmeth_tpu.utils.fasta import DNAReference

    from tests.synth import make_read
    from tests.test_call_mods_e2e import _make_ckpt

    contigs = DNAReference(DEMO_FA).getcontigs()
    name = next(iter(contigs))
    seq = contigs[name]
    assert len(seq) >= 100000  # chr20:10,000,000-10,100,000
    rng = np.random.RandomState(9)
    read_len = 2000
    bam = str(tmp_path / "demo.bam")
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{}\tLN:{}\n".format(
        name, len(seq)), [(name, len(seq))])
    starts = np.sort(rng.randint(0, len(seq) - read_len, size=25))
    with BamWriter(bam, header) as w:
        for i, s in enumerate(starts):
            sub = seq[s : s + read_len]
            if "N" in sub:
                continue
            is_rev = bool(i % 2)
            stored = complement_seq(sub) if is_rev else sub
            w.write(make_read(rng, stored, "demo/{}/ccs".format(i),
                              flag=16 if is_rev else 0, ref_id=0, pos=int(s)))
    _tm, ckpt = _make_ckpt(tmp_path)
    modbam = call_mods_bam(
        CallModsConfig(model_file=ckpt, mode="align", ref=DEMO_FA, batch_size=512),
        bam, str(tmp_path / "m"))
    recs = list(BamReader(modbam))
    assert sum(r.has_tag("MM") for r in recs) >= 20
    outs = call_mods_frequency_from_bamfile(FreqBamConfig(
        input_bam=modbam, ref=DEMO_FA, output=str(tmp_path / "f"), sort=True,
        refsites_only=True))
    out_all = [p for p in outs if ".all." in p][0]
    lines = open(out_all).read().splitlines()
    assert len(lines) > 100
    # every kept site is a reference CpG (refsites_only)
    for line in lines[:200]:
        w = line.split("\t")
        pos = int(w[1])
        assert seq[pos : pos + 2] == "CG", (pos, seq[pos : pos + 2])


def test_demo_bs_truth_readable():
    """The shipped BS-seq truth parses with the correlation tooling's reader."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "corr_bs", "/root/repo/scripts/correlation_with_bs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    meancov, bs = mod.read_methylbed(DEMO_BS, None, None, 1)
    assert len(bs) > 500  # demo file ships ~750 covered CpGs
    assert 0 <= float(bs["Rmet"].iloc[0]) <= 1
