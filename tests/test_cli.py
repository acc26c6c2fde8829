"""CLI surface tests: all 8 subcommands parse; extract/call_mods/call_freqb/
call_freqt run end-to-end through the CLI entry."""

import subprocess
import sys

import numpy as np
import pytest

from ccsmeth_tpu.cli import get_parser, main

from tests.synth import make_synth_bam, write_fasta


def test_parser_has_8_subcommands():
    parser = get_parser()
    subparsers = next(a for a in parser._actions
                      if isinstance(a, type(parser._subparsers._group_actions[0])))
    cmds = set(subparsers.choices.keys())
    assert cmds == {"call_hifi", "call_mods", "align_hifi", "call_freqt",
                    "call_freqb", "extract", "train", "trainm"}


@pytest.mark.parametrize("cmd", ["call_hifi", "call_mods", "align_hifi",
                                 "call_freqt", "call_freqb", "extract", "train",
                                 "trainm"])
def test_subcommand_help(cmd):
    with pytest.raises(SystemExit) as e:
        get_parser().parse_args([cmd, "--help"])
    assert e.value.code == 0


def test_missing_required_args_errors():
    with pytest.raises(SystemExit) as e:
        get_parser().parse_args(["call_mods"])
    assert e.value.code == 2


def test_cli_extract_and_callmods_and_freq(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_call_mods_e2e import _make_ckpt

    bam = str(tmp_path / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=8, read_len=250, ref_len=2500, seed=12)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp_path)

    # extract
    tsv = str(tmp_path / "fx.tsv")
    assert main(["extract", "-i", bam, "-o", tsv, "--mode", "align",
                 "--ref", fasta]) == 0
    lines = open(tsv).read().splitlines()
    assert lines and len(lines[0].split("\t")) == 22

    # call_mods (BAM path)
    assert main(["call_mods", "-i", bam, "-o", str(tmp_path / "mods"),
                 "-m", ckpt, "--mode", "align", "--ref", fasta,
                 "-b", "64", "--dropout_rate", "0"]) == 0
    modbam = str(tmp_path / "mods.modbam.bam")
    from ccsmeth_tpu.bamio import BamReader

    recs = list(BamReader(modbam))
    assert any(r.has_tag("MM") for r in recs)

    # call_mods (TSV path)
    assert main(["call_mods", "-i", tsv, "-o", str(tmp_path / "modst"),
                 "-m", ckpt, "-b", "64", "--dropout_rate", "0"]) == 0
    pr = str(tmp_path / "modst.per_readsite.tsv")
    assert len(open(pr).read().splitlines()) == len(lines)

    # call_freqb count mode
    assert main(["call_freqb", "-i", modbam, "--ref", fasta,
                 "-o", str(tmp_path / "freqb"), "--sort"]) == 0
    freq = str(tmp_path / "freqb.count.all.freq.txt")
    assert len(open(freq).read().splitlines()) > 10

    # call_freqt on per_readsite
    assert main(["call_freqt", "-i", pr, "-o", str(tmp_path / "freqt.txt"),
                 "--sort"]) == 0
    assert len(open(str(tmp_path / "freqt.txt")).read().splitlines()) > 10


def test_cli_version_via_module():
    out = subprocess.run([sys.executable, "-m", "ccsmeth_tpu.cli", "--version"],
                         capture_output=True, text=True, cwd="/root/repo",
                         env={"PATH": "/usr/bin:/bin:/usr/local/bin"})
    assert out.returncode == 0
    assert "ccsmeth-tpu" in out.stdout
