"""TRUE multi-process training validation: two separate JAX processes (4 CPU
devices each) form one 8-device mesh via jax.distributed and run the trainm loop —
exercising global-batch assembly (make_array_from_process_local_data), the psum
gradient reduction, and rank-0-only checkpointing without TPU hardware."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from ccsmeth_tpu.training import TrainConfig, train

cfg = TrainConfig(
    train_file={train!r}, valid_file={valid!r}, model_dir={mdir!r},
    model_type="attbigru2s", layer_rnn=1, hid_rnn=16, batch_size=32,
    dropout_rate=0.1, max_epoch_num=10, min_epoch_num=4, step_interval=2,
    lr=0.01, lr_decay=0.5, lr_decay_step=4, tseed=3,
    train_transfer={transfer!r},
    dist_coordinator={coord!r}, num_processes=2, process_id={pid},
)
result = train(cfg)
print("RANK{pid}_DONE best_acc=%.4f" % result["best_accuracy"])
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("transfer", ["fp32", "packed"])
def test_two_process_training(tmp_path, transfer):
    """transfer=packed also gates the quantized uint8 wire rows through
    make_array_from_process_local_data global-batch assembly."""
    from tests.test_training import _write_feature_tsv

    tr = str(tmp_path / "tr.tsv")
    va = str(tmp_path / "va.tsv")
    _write_feature_tsv(tr, n=256, seed=1)
    _write_feature_tsv(va, n=128, seed=2)
    coord = "127.0.0.1:{}".format(_free_port())
    mdir = str(tmp_path / "m")
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "PALLAS_AXON_POOL_IPS": "",  # keep the axon plugin out of the workers
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "PYTHONPATH": REPO}
    procs = []
    for pid in range(2):
        script = WORKER.format(repo=REPO, train=tr, valid=va, mdir=mdir,
                               coord=coord, pid=pid, transfer=transfer)
        procs.append(subprocess.Popen([sys.executable, "-c", script], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process training timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank {} failed:\n{}".format(pid, out[-4000:])
        assert "RANK{}_DONE".format(pid) in out
    # rank 0 wrote checkpoints; rank 1 did not double-write
    import glob

    ckpts = glob.glob(os.path.join(mdir, "*.ckpt.npz"))
    assert ckpts, "no checkpoints written by rank 0"
    # the model learned something on the separable data
    acc = float(outs[0].split("best_acc=")[1].split()[0])
    assert acc > 0.8
