"""call_hifi / align_hifi wrappers: command construction parity and the in-process
BAM->FASTQ converter (no pbccs/pbmm2 binaries in this image, so commands are
checked, not executed)."""

import io

import numpy as np
import pytest

from ccsmeth_tpu.wrappers.align_hifi import (
    AlignHifiConfig,
    bam2fastq_stream,
    generate_aligner_cmd,
)
from ccsmeth_tpu.wrappers.call_hifi import CallHifiConfig, generate_ccs_cmd

from tests.synth import make_synth_bam


def test_ccs_cmd_construction():
    cfg = CallHifiConfig(subreads="x.subreads.bam", threads=8, min_passes=3,
                        by_strand=True, hd_finder=True, log_level="INFO")
    cmd = generate_ccs_cmd(cfg)
    assert cmd.startswith("ccs --hifi-kinetics")
    for part in ("--log-level INFO", "--min-passes 3", "--num-threads 8",
                 "--by-strand", "--hd-finder"):
        assert part in cmd
    # defaults: no optional flags
    cmd2 = generate_ccs_cmd(CallHifiConfig())
    assert "--min-passes" not in cmd2 and "--by-strand" not in cmd2


def test_aligner_cmd_construction():
    # pbmm2 default (reference align_hifi_reads.py:66-68)
    cmd = generate_aligner_cmd(AlignHifiConfig(threads=6))
    assert cmd.startswith("pbmm2 align --preset CCS -j 6 --sort")
    # minimap2 with secondary suppression (lines 48-59)
    cmd = generate_aligner_cmd(AlignHifiConfig(minimap2=True, bestn=1, threads=4))
    assert "minimap2 -ax map-hifi -y -t 4 --secondary=no" in cmd
    cmd = generate_aligner_cmd(AlignHifiConfig(minimap2=True, bestn=3, threads=4))
    assert "-N 2" in cmd
    # bwa (line 64)
    cmd = generate_aligner_cmd(AlignHifiConfig(bwa=True, threads=2))
    assert cmd.startswith("bwa mem -x pacbio -C -V -t 2")


def test_bam2fastq_preserves_tags(tmp_path):
    bam = str(tmp_path / "x.bam")
    make_synth_bam(bam, n_reads=3, read_len=50, ref_len=500)
    out = io.StringIO()
    n = bam2fastq_stream(bam, out)
    assert n == 3
    lines = out.getvalue().splitlines()
    assert len(lines) == 12
    header = lines[0]
    assert header.startswith("@m0/0/ccs\t")
    assert "fi:B:C," in header and "fn:i:" in header and "sn:B:f," in header
    assert len(lines[1]) == 50  # seq
    assert lines[2] == "+"
    assert len(lines[3]) == 50  # qual


def test_align_rejects_bad_inputs(tmp_path):
    from ccsmeth_tpu.wrappers.align_hifi import align_hifi_reads_to_genome

    with pytest.raises(ValueError, match="bam/sam/fastq"):
        align_hifi_reads_to_genome(AlignHifiConfig(hifireads="x.txt", ref="r.fa"))
    with pytest.raises(IOError):
        align_hifi_reads_to_genome(AlignHifiConfig(hifireads="nope.bam",
                                                   ref="nope.fa"))


def test_call_hifi_rejects_bad_inputs():
    from ccsmeth_tpu.wrappers.call_hifi import ccs_call_hifi_reads

    with pytest.raises(ValueError, match="bam format"):
        ccs_call_hifi_reads(CallHifiConfig(subreads="x.fastq"))
    with pytest.raises(IOError):
        ccs_call_hifi_reads(CallHifiConfig(subreads="nope.bam"))
