"""examples/run_demo.py must run end-to-end (simulate -> train -> call_mods ->
call_freqb) and produce non-empty outputs."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_demo(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="", CCS_FORCE_CPU="1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_demo.py"),
         "--outdir", str(tmp_path / "demo")],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "demo complete" in out.stdout
    bed = tmp_path / "demo" / "freq.count.all.bed"
    assert bed.exists() and sum(1 for _ in open(bed)) > 100
    modbam = tmp_path / "demo" / "demo.modbam.bam"
    assert modbam.exists() and (tmp_path / "demo" / "demo.modbam.bam.bai").exists()
