"""TRUE multi-process collective frequency merge: two separate JAX processes
(4 CPU devices each) form one 8-device mesh via jax.distributed and run
call_freqb in --dist_coordinator mode — each rank scans the full BAM keeping
only reads it owns by qname hash, per-chunk per-site count/histogram tensors
are psum-merged over the 'data' mesh axis, and rank 0 writes the single merged
output. Gate: rank-0 output row-equal to the single-process run (BASELINE.json
north star; replaces the reference's share-nothing freq workers,
/root/reference/ccsmeth/call_mods_freq_bam.py:597-677)."""

import os
import socket
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AGGRE_CKPT = "/root/reference/models/model_ccsmeth_5mCpG_aggregate_attbigru_b11.v2p.ckpt"

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from ccsmeth_tpu.pipeline.call_freq_bam import (
    FreqBamConfig, call_mods_frequency_from_bamfile)

cfg = FreqBamConfig(
    input_bam={bam!r}, ref={fasta!r}, output={out!r}, chunk_len=500,
    call_mode={mode!r}, aggre_model={aggre!r},
    dist_coordinator={coord!r}, num_processes=2, process_id={pid},
)
outs = call_mods_frequency_from_bamfile(cfg)
print("RANK{pid}_DONE nout=%d" % len(outs))
"""


@pytest.fixture(scope="module")
def modbam(tmp_path_factory):
    """Synthetic aligned BAM -> our call_mods -> modbam with HP tags (same
    construction as tests/test_call_freq_bam.py's fixture, but with a path
    that outlives this module's worker subprocesses)."""
    import numpy as np
    from types import SimpleNamespace

    from ccsmeth_tpu.bamio import BamReader, BamWriter
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam
    from tests.synth import make_synth_bam, write_fasta
    from tests.test_call_mods_e2e import _make_ckpt

    tmp = tmp_path_factory.mktemp("freqdist")
    bam = str(tmp / "in.bam")
    refseq, _ = make_synth_bam(bam, n_reads=30, read_len=400, ref_len=3000,
                               seed=33)
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, {"chrS": refseq})
    _tm, ckpt = _make_ckpt(tmp, seed=17)
    cfg = CallModsConfig(model_file=ckpt, mode="align", ref=fasta,
                         batch_size=128)
    out = call_mods_bam(cfg, bam, str(tmp / "mods"))
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
    return SimpleNamespace(bam=tagged, refseq=refseq, fasta=fasta)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse_freq_txt(path):
    rows = []
    for line in open(path):
        w = line.rstrip("\n").split("\t")
        rows.append((w[0], int(w[1]), w[3], w[6], w[7], w[8], w[9]))
    return rows


def _run_two_process(modbam, tmp_path, mode):
    coord = "127.0.0.1:{}".format(_free_port())
    out = str(tmp_path / "dist")
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "PALLAS_AXON_POOL_IPS": "",  # keep the axon plugin out of the workers
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "PYTHONPATH": REPO}
    procs = []
    for pid in range(2):
        script = WORKER.format(repo=REPO, bam=modbam.bam, fasta=modbam.fasta,
                               out=out, mode=mode, aggre=AGGRE_CKPT,
                               coord=coord, pid=pid)
        procs.append(subprocess.Popen([sys.executable, "-c", script], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process call_freqb timed out")
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank {} failed:\n{}".format(pid, o[-4000:])
        assert "RANK{}_DONE".format(pid) in o
    # rank 0 wrote the single merged output; rank 1 wrote nothing
    assert "nout=0" in outs[1]
    return out


def _single(modbam, tmp_path, mode):
    from ccsmeth_tpu.pipeline.call_freq_bam import (
        FreqBamConfig, call_mods_frequency_from_bamfile)

    cfg = FreqBamConfig(input_bam=modbam.bam, ref=modbam.fasta,
                        output=str(tmp_path / "single"), chunk_len=500,
                        call_mode=mode, aggre_model=AGGRE_CKPT)
    return call_mods_frequency_from_bamfile(cfg)


def _rows_by_tag(prefix_outputs):
    by = {}
    for p in prefix_outputs:
        for tag in ("all", "hp1", "hp2"):
            if ".{}.".format(tag) in p:
                by[tag] = sorted(_parse_freq_txt(p),
                                 key=lambda x: (x[0], x[1], x[2]))
    return by


def test_two_process_count_merge_equals_single(modbam, tmp_path):
    single_outs = _single(modbam, tmp_path, "count")
    want = _rows_by_tag(single_outs)
    prefix = _run_two_process(modbam, tmp_path, "count")
    got_paths = ["{}.count.{}.freq.txt".format(prefix, tag) for tag in
                 ("all", "hp1", "hp2")]
    got = _rows_by_tag([p for p in got_paths if os.path.exists(p)])
    assert set(got) == set(want)
    for tag in want:
        assert got[tag] == want[tag], "{} rows differ".format(tag)


def test_two_process_aggregate_merge_equals_single(modbam, tmp_path):
    single_outs = _single(modbam, tmp_path, "aggregate")
    want = _rows_by_tag(single_outs)
    prefix = _run_two_process(modbam, tmp_path, "aggregate")
    got_paths = ["{}.aggregate.{}.freq.txt".format(prefix, tag) for tag in
                 ("all", "hp1", "hp2")]
    got = _rows_by_tag([p for p in got_paths if os.path.exists(p)])
    assert set(got) == set(want)
    for tag in want:
        # EXACT row equality: the aggregate regressor is pinned to one device
        # (AggrPredictor), so model scores cannot depend on mesh layout or
        # device count (VERDICT r2 weak #6)
        assert got[tag] == want[tag], "{} rows differ".format(tag)
