"""Training for the call_freqb aggregate regressor (AggrAttRNN).

The reference defines the aggregate dataset format (ccsmeth/dataloader.py:153-194,
AggreFeaData: chrom, pos, strand, offsets, histograms(;-joined), covs, label) but
ships no training loop for it — the v2p ckpt was trained out-of-tree. This module
closes that gap TPU-natively: MSE regression against BS-seq frequencies on the
same jitted mesh step infrastructure as the main trainer.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import AggrConfig, apply_aggr_attrnn, init_aggr_attrnn
from ..models.convert import torch_ckpt_to_params
from ..models.params_io import load_params, save_params
from ..parallel.mesh import data_mesh, replicated_spec, shard_batch_spec
from ..utils.logging import mylogger
from .optim import LrSchedule, build_optimizer, set_learning_rate

LOGGER = mylogger(__name__)


def load_aggre_tsv(path: str, seq_len: int = 11, binsize: int = 20):
    """Parse AggreFeaData rows -> columnar arrays (offsets, histos, covs, labels)."""
    offsets, histos, covs, labels = [], [], [], []
    with open(path) as rf:
        for line in rf:
            w = line.rstrip("\n").split("\t")
            offsets.append(np.asarray(w[3].split(","), dtype=np.float32))
            histos.append(np.asarray(
                [row.split(",") for row in w[4].split(";")], dtype=np.float32))
            covs.append(np.asarray(w[5].split(","), dtype=np.float32))
            labels.append(float(w[6]))
    return {
        "offsets": np.stack(offsets),
        "histos": np.stack(histos),
        "covs": np.stack(covs),
        "labels": np.asarray(labels, dtype=np.float32),
    }


@dataclasses.dataclass
class AggreTrainConfig:
    train_file: str = ""
    valid_file: str = ""
    model_dir: str = ""
    model_type: str = "attbigru"
    seq_len: int = 11
    layer_rnn: int = 1
    hid_rnn: int = 32
    bin_size: int = 20
    dropout_rate: float = 0.5
    optim_type: str = "Adam"
    batch_size: int = 512
    lr: float = 0.001
    lr_decay: float = 0.1
    lr_decay_step: int = 1
    lr_scheduler: str = "StepLR"
    max_epoch_num: int = 50
    min_epoch_num: int = 5
    step_interval: int = 100
    init_model: str | None = None
    tseed: int = 1234


def train_aggregate(cfg: AggreTrainConfig) -> dict:
    t0 = time.time()
    model_cfg = AggrConfig(seq_len=cfg.seq_len, num_layers=cfg.layer_rnn,
                           dropout_rate=cfg.dropout_rate, hidden_size=cfg.hid_rnn,
                           binsize=cfg.bin_size, model_type=cfg.model_type)
    os.makedirs(cfg.model_dir, exist_ok=True)
    train = load_aggre_tsv(cfg.train_file, cfg.seq_len, cfg.bin_size)
    valid = load_aggre_tsv(cfg.valid_file, cfg.seq_len, cfg.bin_size)
    LOGGER.info("train %d rows, valid %d rows", len(train["labels"]),
                len(valid["labels"]))

    if cfg.init_model:
        params = (load_params(cfg.init_model) if cfg.init_model.endswith(".npz")
                  else torch_ckpt_to_params(cfg.init_model, model_cfg))
    else:
        params = init_aggr_attrnn(cfg.tseed, model_cfg)
    optimizer = build_optimizer(cfg.optim_type, cfg.lr)
    opt_state = optimizer.init(params)
    mesh = data_mesh()
    n_dev = mesh.devices.size
    pad_n = -(-cfg.batch_size // n_dev) * n_dev
    bsp = shard_batch_spec(mesh)
    rep = replicated_spec(mesh)

    def loss_fn(params, offsets, histos, labels, mask, rng):
        out = apply_aggr_attrnn(params, model_cfg, offsets, histos,
                                dropout_rng=rng, train=True)[:, 0]
        se = (out - labels) ** 2 * mask
        return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1.0)

    # one (B, L + L*bins + 2) fp32 array per step instead of 4 device_puts —
    # the aggregate model's steps are tiny, so fixed-latency put RPCs dominate
    # on remote-attached devices (same rationale as train.py's packed batch)
    L, NB = cfg.seq_len, cfg.bin_size

    def _unpack(flat):
        offsets = flat[:, :L]
        histos = flat[:, L:L + L * NB].reshape(-1, L, NB)
        labels = flat[:, L + L * NB]
        mask = flat[:, L + L * NB + 1]
        return offsets, histos, labels, mask

    @jax.jit
    def train_step(params, opt_state, flat, rng):
        offsets, histos, labels, mask = _unpack(flat)
        loss, grads = jax.value_and_grad(loss_fn)(params, offsets, histos, labels,
                                                  mask, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, flat):
        offsets, histos, labels, mask = _unpack(flat)
        out = apply_aggr_attrnn(params, model_cfg, offsets, histos)[:, 0]
        out = jnp.clip(out, 0, 1)
        se = (out - labels) ** 2 * mask
        return jnp.sum(se), jnp.sum(mask)

    def batches(data, shuffle, rng):
        n = len(data["labels"])
        idx = np.arange(n)
        if shuffle:
            rng.shuffle(idx)
        for s in range(0, n, cfg.batch_size):
            sel = idx[s : s + cfg.batch_size]
            nv = len(sel)
            flat = np.zeros((pad_n, L + L * NB + 2), np.float32)
            flat[:nv, :L] = data["offsets"][sel]
            flat[:nv, L:L + L * NB] = data["histos"][sel].reshape(nv, -1)
            flat[:nv, L + L * NB] = data["labels"][sel]
            flat[:nv, L + L * NB + 1] = 1.0
            yield jax.device_put(flat, bsp)

    params = jax.device_put(params, rep)
    sched = LrSchedule(cfg.lr_scheduler, cfg.lr, cfg.lr_decay, cfg.lr_decay_step)
    rng = jax.random.PRNGKey(cfg.tseed)
    nprng = np.random.RandomState(cfg.tseed)
    best_rmse = np.inf
    best_epoch = 0
    ckpts = []
    for epoch in range(cfg.max_epoch_num):
        no_best = True
        tlosses = []
        for i, flat in enumerate(batches(train, True, nprng)):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state, flat, sub)
            tlosses.append(float(loss))
        sse = cnt = 0.0
        for flat in batches(valid, False, nprng):
            s, c = eval_step(params, flat)
            sse += float(s)
            cnt += float(c)
        rmse = float(np.sqrt(sse / max(cnt, 1.0)))
        LOGGER.info("Epoch [%d/%d] TrainLoss: %.5f ValidRMSE: %.5f (best %.5f)",
                    epoch + 1, cfg.max_epoch_num, float(np.mean(tlosses)), rmse,
                    best_rmse)
        if rmse < best_rmse - 1e-5:
            best_rmse = rmse
            best_epoch = epoch + 1
            no_best = False
            p = os.path.join(cfg.model_dir, "{}.aggre.b{}_epoch{}.ckpt.npz".format(
                cfg.model_type, cfg.seq_len, epoch + 1))
            save_params(p, jax.device_get(params))
            ckpts.append(p)
        new_lr = sched.epoch_end([1.0 - rmse])
        opt_state = set_learning_rate(opt_state, new_lr)
        if no_best and epoch >= cfg.min_epoch_num - 1:
            LOGGER.info("early stop!")
            break
    LOGGER.info("[main]train_aggregate costs %.1f s, best RMSE %.5f (epoch %d)",
                time.time() - t0, best_rmse, best_epoch)
    return {"best_rmse": best_rmse, "best_epoch": best_epoch, "ckpts": ckpts}
