"""Unified training loop on a device mesh.

One code path covers the reference's `train` (single host, train.py:32-340) and
`trainm` (DDP/NCCL, train_multigpu.py:86-489): the batch is sharded on the mesh's
'data' axis, params/optimizer state are replicated, and XLA's gradient psum replaces
DDP all-reduce. Multi-host runs call jax.distributed.initialize first and shard
batches per host (DistributedSampler analog in data.py).

Loop semantics parity (train.py): weighted CE [1, pos_weight], grad-clip 0.5,
validation every step_interval with accuracy/precision/recall, checkpoint on
best-accuracy (tolerance 2e-4) named '{model_type}.b{seq_len}_epoch{N}.ckpt.npz'
(+ betterthanlast), StepLR/ReduceLROnPlateau, early stop after an epoch without a
new best once min_epoch_num is reached.
"""

from __future__ import annotations

import dataclasses
import os
import re
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import AttRNNConfig, TransEncConfig, apply_attrnn, init_attrnn
from ..models.convert import torch_ckpt_to_params
from ..models.params_io import load_params, save_params
from ..models.transenc import apply_transenc, init_transenc
from ..parallel.mesh import data_mesh, replicated_spec, shard_batch_spec
from ..utils.logging import mylogger
from .data import FeatureDataset, StreamingFeatureDataset
from .optim import LrSchedule, build_optimizer, set_learning_rate

LOGGER = mylogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    train_file: str = ""
    valid_file: str = ""
    model_dir: str = ""
    model_type: str = "attbigru2s"
    seq_len: int = 21
    is_npass: bool = True
    is_sn: bool = False
    is_map: bool = False
    is_stds: bool = False
    class_num: int = 2
    dropout_rate: float = 0.5
    layer_rnn: int = 3
    hid_rnn: int = 256
    layer_trans: int = 6
    nhead: int = 4
    d_model: int = 256
    dim_ff: int = 512
    optim_type: str = "Adam"
    batch_size: int = 512
    lr_scheduler: str = "StepLR"
    lr: float = 0.001
    lr_decay: float = 0.1
    lr_decay_step: int = 1
    lr_patience: int = 0
    lr_mode_strategy: str = "last"
    max_epoch_num: int = 50
    min_epoch_num: int = 10
    pos_weight: float = 1.0
    step_interval: int = 500
    init_model: str | None = None
    tseed: int = 1234
    # full-state checkpointing (beyond the reference's warm-start-only resume,
    # SURVEY.md §5.4): persist optimizer state + epoch next to each params ckpt
    save_opt_state: bool = False
    resume_from: str | None = None  # params .npz; sibling .train_state.npz restores
    #                                 optimizer state + epoch
    # fuse k train steps into ONE transfer + ONE dispatch (lax.scan through the
    # (params, opt_state) carry) between logging boundaries — per-step numerics
    # and rng stream unchanged; cuts per-step RPC 1/k on remote runtimes
    step_fuse: int = 8
    # 'pallas' trains through the fused kernels + custom VJP (GRU, zero h0)
    dl_offsets: bool = False  # out-of-core streaming loader
    rnn_backend: str = "xla"
    precision: str = "fp32"  # fp32 | bf16 (pallas matmul operand dtype)
    # wire format of the packed train batch: bf16 halves the per-step
    # host->device transfer; packed ships quantized byte rows (~11x smaller
    # than fp32 — kmer/npass/labels/mask exact, kinetics 1/16 granularity).
    # Opt-in; the fp32 default is bit-exact.
    train_transfer: str = "fp32"  # fp32 | bf16 | packed
    # distributed (trainm parity: nodes/node_rank replaced by jax.distributed)
    dist_coordinator: str | None = None  # e.g. "10.0.0.1:1234"
    num_processes: int = 1
    process_id: int = 0

    def model_config(self):
        if self.model_type == "transencoder2s":
            return TransEncConfig(
                seq_len=self.seq_len, num_layers=self.layer_trans,
                num_classes=self.class_num, dropout_rate=self.dropout_rate,
                d_model=self.d_model, nhead=self.nhead, dim_ff=self.dim_ff,
                is_npass=self.is_npass, is_sn=self.is_sn, is_map=self.is_map,
                is_stds=self.is_stds)
        return AttRNNConfig(
            seq_len=self.seq_len, num_layers=self.layer_rnn,
            num_classes=self.class_num, dropout_rate=self.dropout_rate,
            hidden_size=self.hid_rnn, is_npass=self.is_npass, is_sn=self.is_sn,
            is_map=self.is_map, is_stds=self.is_stds, model_type=self.model_type)


def _apply_fn(model_cfg, rnn_backend: str = "xla", precision: str = "fp32"):
    if isinstance(model_cfg, TransEncConfig):
        if precision == "bf16":
            def apply_te_bf16(params, cfg, feats, **kw):
                return apply_transenc(params, cfg, feats,
                                      compute_dtype=jnp.bfloat16, **kw)

            return apply_te_bf16
        return apply_transenc
    if not model_cfg.two_strand:
        from ..models import apply_attrnn_ss

        return apply_attrnn_ss
    if rnn_backend == "pallas":
        dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

        def apply_pallas(params, cfg, feats, **kw):
            return apply_attrnn(params, cfg, feats, rnn_backend="pallas",
                                compute_dtype=dtype, **kw)

        return apply_pallas
    return apply_attrnn


def _init_params(cfg: TrainConfig, model_cfg):
    if cfg.init_model:
        LOGGER.info("loading pre-trained model: %s", cfg.init_model)
        if cfg.init_model.endswith(".npz"):
            return load_params(cfg.init_model)
        return torch_ckpt_to_params(cfg.init_model, model_cfg)
    if isinstance(model_cfg, TransEncConfig):
        return init_transenc(cfg.tseed, model_cfg)
    return init_attrnn(cfg.tseed, model_cfg)


def _batch_layout(model_cfg) -> list[tuple[str, int]]:
    """Column layout of a packed (B, n_cols) fp32 training batch: every feature
    channel flattened side by side, then one labels column and one mask column."""
    from .data import _FEATURE_KEYS, _FEATURE_KEYS_SS

    L = model_cfg.seq_len
    keys = (_FEATURE_KEYS if getattr(model_cfg, "two_strand", True)
            else _FEATURE_KEYS_SS)
    return [(k, 4 if k.startswith("sns") else L) for k in keys]


def _pack_cols(fields, feats: dict, labels, mask,
               dtype=np.float32) -> np.ndarray:
    B = np.asarray(labels).shape[0]
    cols = []
    for k, n in fields:
        v = np.asarray(feats[k], np.float32).reshape(B, -1)
        assert v.shape[1] == n, "channel {} has {} cols, layout says {}".format(
            k, v.shape[1], n)
        cols.append(v)
    cols.append(np.asarray(labels, np.float32).reshape(B, 1))
    cols.append(np.asarray(mask, np.float32).reshape(B, 1))
    flat = np.ascontiguousarray(np.concatenate(cols, axis=1))
    # opt-in bf16 wire rows (--train_transfer bf16): halves the per-step
    # transfer the tunnel-bound trainm loop pays (labels/mask are 0/1 —
    # exact in bf16; features round to ~3 decimal digits)
    return flat if dtype == np.float32 else flat.astype(dtype)


def _unpack_cols(flat, fields):
    flat = flat.astype(jnp.float32)  # bf16 wire rows dequantize on device
    feats, o = {}, 0
    for k, n in fields:
        feats[k] = flat[:, o:o + n]
        o += n
    labels = flat[:, o].astype(jnp.int32)
    mask = flat[:, o + 1]
    return feats, labels, mask


# --- quantized byte rows (--train_transfer packed) --------------------------
# The trainm loop through a remote-attached device is WIRE-bound: at B=512 the
# fp32 row is 1216 B/sample and the measured wire:compute ratio is ~3.5:1
# (BASELINE.md round-4 step-rate capture: 90.2k samples/s device ceiling vs
# 22.7k steady-state). Shipping the same byte-row format the inference
# dispatch uses (parallel/mesh.py _pack/_unpack) cuts the flagship row to
# 112 B/sample: kmer 4-bit-packed (EXACT), per-read pass count one u16 scalar
# (EXACT for integer BAM npass tags), standardized IPD/PW kinetics int8
# round(x*16) (±7.94 range, 1/16 granularity), labels/mask u8 (EXACT).
# Channels the model config disables (is_stds/is_sn/is_map) are dropped from
# the wire and restored as zeros on device — the model never reads them
# (models/attrnn.py:167-229). Opt-in: kinetics rows round to 1/32; the fp32
# path stays the parity default. The kmer4/u16/int8 encodings are the SHARED
# wire primitives (utils/wirefmt.py) — one definition for train + inference.


def _q_fields(model_cfg) -> list[tuple[str, str, int]]:
    """(key, kind, nbytes) wire layout of one quantized training row. Kinds:
    kmer4 = two 4-bit base codes/byte; u16s = one uint16 scalar broadcast to
    (B, L) on device; i8q = int8 round(x*16); bf16 = raw bfloat16 bytes;
    u8frac = uint8 round(x*255) for [0,1] fractions (maps identity column)."""
    L = model_cfg.seq_len
    per = [("kmer", "kmer4", (L + 1) // 2), ("kpass", "u16s", 2),
           ("ipd_means", "i8q", L), ("pw_means", "i8q", L)]
    if getattr(model_cfg, "is_stds", False):
        per += [("ipd_stds", "i8q", L), ("pw_stds", "i8q", L)]
    if getattr(model_cfg, "is_sn", False):
        per += [("sns", "bf16", 8)]
    if getattr(model_cfg, "is_map", False):
        per += [("maps", "u8frac", L)]
    strands = ("", "2") if getattr(model_cfg, "two_strand", True) else ("",)
    return [(k + s, kind, nb) for s in strands for k, kind, nb in per]


def _pack_rows_q(fields, feats: dict, labels, mask) -> np.ndarray:
    """Host-side pack of one batch into (B, row_bytes) uint8 quantized rows
    (+1 labels byte, +1 mask byte at the end)."""
    import ml_dtypes

    from ..utils.wirefmt import pack_kmer4_np, pack_u16_np, quant_i8_np

    B = np.asarray(labels).shape[0]
    row = sum(nb for _k, _kind, nb in fields) + 2
    buf = np.empty((B, row), np.uint8)
    o = 0
    for k, kind, nb in fields:
        v = np.asarray(feats[k], np.float32)
        if kind == "kmer4":
            buf[:, o:o + nb] = pack_kmer4_np(v)
        elif kind == "u16s":
            buf[:, o:o + nb] = pack_u16_np(v.reshape(B, -1)[:, 0])
        elif kind == "i8q":
            buf[:, o:o + nb] = quant_i8_np(v).view(np.uint8)
        elif kind == "bf16":
            buf[:, o:o + nb] = np.ascontiguousarray(
                v.astype(ml_dtypes.bfloat16)).view(np.uint8).reshape(B, -1)
        else:  # u8frac
            buf[:, o:o + nb] = np.clip(np.rint(v * 255.0), 0, 255).astype(np.uint8)
        o += nb
    buf[:, o] = np.asarray(labels).astype(np.uint8)
    buf[:, o + 1] = np.asarray(mask).astype(np.uint8)
    return buf


def _unpack_rows_q(buf, fields, model_cfg):
    """On-device unpack of quantized rows back to the full fp32 feats dict
    (disabled channels restored as zeros), labels int32, mask fp32."""
    from ..utils.wirefmt import dequant_i8_jx, unpack_kmer4_jx, unpack_u16_jx

    L = model_cfg.seq_len
    B = buf.shape[0]
    feats, o = {}, 0
    for k, kind, nb in fields:
        raw = buf[:, o:o + nb]
        if kind == "kmer4":
            feats[k] = unpack_kmer4_jx(raw, L).astype(jnp.float32)
        elif kind == "u16s":
            s = unpack_u16_jx(raw)
            feats[k] = jnp.broadcast_to(s.astype(jnp.float32), (B, L))
        elif kind == "i8q":
            feats[k] = dequant_i8_jx(jax.lax.bitcast_convert_type(raw, jnp.int8))
        elif kind == "bf16":
            v = jax.lax.bitcast_convert_type(
                raw.reshape(B, nb // 2, 2), jnp.bfloat16)
            feats[k] = v.astype(jnp.float32)
        else:  # u8frac
            feats[k] = raw.astype(jnp.float32) * (1.0 / 255.0)
        o += nb
    labels = buf[:, o].astype(jnp.int32)
    mask = buf[:, o + 1].astype(jnp.float32)
    for k, n in _batch_layout(model_cfg):  # zeros for wire-dropped channels
        if k not in feats:
            feats[k] = jnp.zeros((B, n), jnp.float32)
    return feats, labels, mask


def _fuse_schedule(total: int, interval: int, k: int):
    """Group sizes for the fused train dispatch: runs of exactly k steps that
    never cross a logging/validation boundary (a multiple of `interval`, or
    `total`); remainder steps run singly. Only two executable shapes exist (k
    and 1), and the schedule is deterministic — identical on every rank."""
    i = 0
    while i < total:
        seg = min(interval - (i % interval), total - i)
        size = k if (k > 1 and seg >= k) else 1
        yield size
        i += size


def _prefetch(iterator, stage, depth: int = 2):
    """Yield `stage(item)` for each item, with staging (batch pack +
    host->device transfer) running `depth` ahead on a worker thread.

    The reference overlaps loading with compute via DataLoader worker processes
    (train.py:60-67 num_workers); here one thread suffices because staging is
    numpy packing + a device_put — on a remote-attached device that put is a
    fixed-latency RPC, and without prefetch it serializes with every step.
    Close or exhaust the generator to stop the worker."""
    import queue as _queue

    done = object()
    q: _queue.Queue = _queue.Queue(maxsize=depth)
    stop = threading.Event()
    err: list[BaseException] = []

    def work():
        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        try:
            for item in iterator:
                if not put(stage(item)):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            err.append(e)
        finally:
            put(done)

    t = threading.Thread(target=work, daemon=True, name="ccs-train-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                break
            yield item
        if err:
            raise err[0]
    finally:
        stop.set()


def make_train_step(model_cfg, optimizer, pos_weight: float, mesh=None,
                    rnn_backend: str = "xla", precision: str = "fp32",
                    transfer_dtype=np.float32, train_transfer: str = ""):
    """Build the jitted sharded train step: (params, opt_state, feats, labels,
    valid_mask, rng) -> (params, opt_state, loss).

    The step is shard_mapped over the 'data' mesh axis (classic DDP: each device
    differentiates its local batch shard, gradients/loss are psum-merged, the
    optimizer update runs replicated) rather than left to GSPMD propagation —
    auto-sharding the RNN scan's backward pass resharded the per-timestep weight
    -gradient accumulators through replication ("[SPMD] Involuntary full
    rematerialization"); explicit collectives pin the communication to one psum
    per gradient leaf, the direct analog of the reference's DDP all-reduce
    (train_multigpu.py:86-94)."""
    if mesh is None:
        mesh = data_mesh()
    from jax.sharding import PartitionSpec as P

    apply_ = _apply_fn(model_cfg, rnn_backend, precision)
    class_weights = jnp.array([1.0, pos_weight], jnp.float32)

    def loss_fn(params, feats, labels, mask, rng):
        logits, _probs = apply_(params, model_cfg, feats, dropout_rng=rng, train=True)
        per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        w = class_weights[labels] * mask
        # torch CrossEntropyLoss(weight=..) mean = sum(w_i * l_i) / sum(w_i);
        # the denominator is the GLOBAL weight sum (w is params-independent, so
        # it contributes no gradient term)
        den = jax.lax.psum(jnp.sum(w), "data")
        return jnp.sum(per * w) / jnp.maximum(den, 1e-9)

    def shard_step(params, opt_state, feats, labels, mask, rng):
        # independent dropout masks per shard
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, labels, mask, rng)
        loss = jax.lax.psum(loss, "data")
        grads = jax.lax.psum(grads, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # check_vma off: the RNN scan's zero h0 carry is device-invariant while the
    # body output varies with the batch shard, which the static VMA check
    # rejects; the collectives above are what make the outputs replicated
    step = jax.shard_map(shard_step, mesh=mesh,
                         in_specs=(P(), P(), P("data"), P("data"), P("data"), P()),
                         out_specs=(P(), P(), P()), check_vma=False)
    jit_dict = jax.jit(step)

    # packed companion: the training loop ships ONE (B, n_cols) fp32 array per
    # step instead of ~18 per-channel arrays — on a remote-attached device each
    # host->device transfer is a fixed-latency RPC, and at batch 512 the per-
    # channel arrays are far too small to amortize it (same rationale as the
    # inference packed dispatch, parallel/mesh.py)
    fields = _batch_layout(model_cfg)
    quant = train_transfer == "packed"
    qfields = _q_fields(model_cfg) if quant else None

    def shard_step_packed(params, opt_state, flat, rng):
        if quant:
            feats, labels, mask = _unpack_rows_q(flat, qfields, model_cfg)
        else:
            feats, labels, mask = _unpack_cols(flat, fields)
        return shard_step(params, opt_state, feats, labels, mask, rng)

    jit_packed = jax.jit(jax.shard_map(
        shard_step_packed, mesh=mesh, in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()), check_vma=False))

    # fused companion: k packed batches in ONE (k, B, n_cols) transfer and ONE
    # executable dispatch — lax.scan chains the identical per-step math through
    # the (params, opt_state) carry and returns the k per-step losses. On a
    # remote-attached runtime this cuts the per-step dispatch/transfer RPC to
    # 1/k (the training-loop analog of the inference dispatch_fuse); per-step
    # numerics are unchanged (same step program, same rng stream — gated by
    # tests/test_training.py fuse-vs-single equality).
    def shard_step_packed_many(params, opt_state, flats, rngs):
        def body(carry, per):
            p, o = carry
            flat, rng = per
            p, o, loss = shard_step_packed(p, o, flat, rng)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (flats, rngs))
        return params, opt_state, losses

    jit_packed_many = jax.jit(jax.shard_map(
        shard_step_packed_many, mesh=mesh,
        in_specs=(P(), P(), P(None, "data"), P()),
        out_specs=(P(), P(), P()), check_vma=False))

    def jstep(params, opt_state, feats, labels, mask, rng):
        return jit_dict(params, opt_state, feats, labels, mask, rng)

    jstep.jitted = jit_dict  # AOT handle (lower/compile) for cost-model gates
    jstep.packed = jit_packed
    jstep.packed_many = jit_packed_many
    if quant:
        jstep.pack_batch = lambda feats, labels, mask: _pack_rows_q(
            qfields, feats, labels, mask)
    else:
        jstep.pack_batch = lambda feats, labels, mask: _pack_cols(
            fields, feats, labels, mask, transfer_dtype)
    return jstep, mesh


def make_eval_step(model_cfg, pos_weight: float, mesh=None):
    """Eval step returning (loss, pred, counts) where counts is the replicated
    [n_valid, correct, tp, fp, fn] vector over the GLOBAL batch. Metric counts
    are reduced on-device so every process sees identical numbers — the
    checkpoint/early-stop decisions they drive must be identical on all ranks or
    one rank exits the collective loop while others wait (the reference keeps
    its early-stop signal global the same way: dist.barrier() + reduce_mean of
    the valid loss, train_multigpu.py:378-380,413-415)."""
    if mesh is None:
        mesh = data_mesh()
    batch_s = shard_batch_spec(mesh)
    rep = replicated_spec(mesh)
    apply_ = _apply_fn(model_cfg)
    class_weights = jnp.array([1.0, pos_weight], jnp.float32)

    def step(params, feats, labels, mask):
        logits, probs = apply_(params, model_cfg, feats)
        per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        w = class_weights[labels] * mask
        loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-9)
        pred = jnp.argmax(probs, axis=1)
        v = mask > 0
        pos_p = (pred == 1) & v
        pos_l = labels == 1
        counts = jnp.stack([
            jnp.sum(mask),
            jnp.sum((pred == labels) & v).astype(jnp.float32),
            jnp.sum(pos_p & pos_l).astype(jnp.float32),
            jnp.sum(pos_p & ~pos_l).astype(jnp.float32),
            jnp.sum((pred == 0) & v & pos_l).astype(jnp.float32),
        ])
        return loss, pred, counts

    jit_dict = jax.jit(step, in_shardings=(rep, batch_s, batch_s, batch_s),
                       out_shardings=(rep, batch_s, rep))
    fields = _batch_layout(model_cfg)

    def step_packed(params, flat):
        feats, labels, mask = _unpack_cols(flat, fields)
        return step(params, feats, labels, mask)

    jit_packed = jax.jit(step_packed, in_shardings=(rep, batch_s),
                         out_shardings=(rep, batch_s, rep))

    # fused validation sweep (r5, VERDICT r4 next #3): the whole staged valid
    # set (n, B, n_cols) scans through ONE device call returning per-batch
    # losses (n,) and per-batch metric counts (n, 5) — the training loop's
    # per-interval validation then costs one dispatch + one small fetch
    # instead of a dispatch + loss/counts round-trip per batch (the measured
    # ~1.5 s/epoch RPC floor of trainm steady state, PERF.md §1). Counts are
    # summed on the host in float64, matching the per-batch path's numerics.
    mega_s = NamedSharding(mesh, P(None, "data"))

    def step_packed_many(params, flats):
        def body(c, flat):
            loss, _pred, counts = step_packed(params, flat)
            return c, (loss, counts)

        _, (losses, counts) = jax.lax.scan(body, jnp.int32(0), flats)
        return losses, counts

    jit_packed_many = jax.jit(step_packed_many, in_shardings=(rep, mega_s),
                              out_shardings=(rep, rep))

    def jstep(params, feats, labels, mask):
        return jit_dict(params, feats, labels, mask)

    jstep.packed = jit_packed
    jstep.packed_many = jit_packed_many
    jstep.pack_batch = lambda feats, labels, mask: _pack_cols(fields, feats,
                                                              labels, mask)
    return jstep, mesh


def save_train_state(path: str, opt_state, epoch: int) -> None:
    """Flatten the optax state pytree to an npz (leaves only; the structure is
    rebuilt from optimizer.init at load time, so optimizer config must match)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez_compressed(path, __epoch=np.int64(epoch),
                        **{"leaf_{}".format(i): np.asarray(l)
                           for i, l in enumerate(leaves)})


def load_train_state(path: str, opt_state_template):
    data = np.load(path)
    epoch = int(data["__epoch"])
    leaves = [data["leaf_{}".format(i)]
              for i in range(len(jax.tree_util.tree_leaves(opt_state_template)))]
    treedef = jax.tree_util.tree_structure(opt_state_template)
    return jax.tree_util.tree_unflatten(treedef, leaves), epoch


def binary_metrics(labels: np.ndarray, preds: np.ndarray) -> tuple[float, float, float]:
    """accuracy, precision, recall (sklearn-equivalent, positive class 1)."""
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    acc = float(np.mean(labels == preds)) if len(labels) else 0.0
    tp = int(np.sum((preds == 1) & (labels == 1)))
    fp = int(np.sum((preds == 1) & (labels == 0)))
    fn = int(np.sum((preds == 0) & (labels == 1)))
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    return acc, prec, rec


def train(cfg: TrainConfig) -> dict:
    """Run training; returns {'best_accuracy', 'best_epoch', 'ckpts': [...]}."""
    t0 = time.time()
    if cfg.dist_coordinator:
        jax.distributed.initialize(cfg.dist_coordinator, cfg.num_processes,
                                   cfg.process_id)

    model_cfg = cfg.model_config()
    model_dir = cfg.model_dir
    if model_dir != "/":
        model_dir = os.path.abspath(model_dir).rstrip("/")
        os.makedirs(model_dir, exist_ok=True)
        # clear stale ckpts of this model_type (train.py:77-80)
        rx = re.compile(r"" + cfg.model_type + r"\..*b\d+_epoch\d+\.ckpt.*")
        for mfile in os.listdir(model_dir):
            if rx.match(mfile):
                os.remove(os.path.join(model_dir, mfile))
        model_dir += "/"

    LOGGER.info("reading data..")
    single_strand = not model_cfg.two_strand if hasattr(model_cfg, "two_strand") else False
    if cfg.dl_offsets:
        # out-of-core chunked-shuffle loading for files that don't fit in RAM
        # (reference FeaData2 --dl_offsets analog)
        train_ds = StreamingFeatureDataset(cfg.train_file, cfg.seq_len, single_strand)
        valid_ds = StreamingFeatureDataset(cfg.valid_file, cfg.seq_len, single_strand)
    else:
        train_ds = FeatureDataset.from_tsv(cfg.train_file, cfg.seq_len, single_strand)
        valid_ds = FeatureDataset.from_tsv(cfg.valid_file, cfg.seq_len, single_strand)

    if cfg.resume_from:
        cfg = dataclasses.replace(cfg, init_model=cfg.resume_from)
    params = _init_params(cfg, model_cfg)
    optimizer = build_optimizer(cfg.optim_type, cfg.lr)
    mesh = data_mesh()
    n_dev = mesh.devices.size
    pad_n = -(-cfg.batch_size // n_dev) * n_dev
    if cfg.train_transfer not in ("fp32", "bf16", "packed"):
        raise ValueError("train_transfer must be fp32, bf16 or packed")
    tdt = np.float32
    if cfg.train_transfer == "bf16":
        import ml_dtypes

        tdt = np.dtype(ml_dtypes.bfloat16)
    train_step, _ = make_train_step(model_cfg, optimizer, cfg.pos_weight, mesh,
                                    cfg.rnn_backend, cfg.precision,
                                    transfer_dtype=tdt,
                                    train_transfer=cfg.train_transfer)
    eval_step, _ = make_eval_step(model_cfg, cfg.pos_weight, mesh)
    opt_state = optimizer.init(params)
    start_epoch = 0
    if cfg.resume_from:
        state_path = cfg.resume_from.replace(".ckpt.npz", ".train_state.npz")
        if os.path.exists(state_path):
            opt_state, start_epoch = load_train_state(state_path, opt_state)
            LOGGER.info("resumed optimizer state at epoch %d from %s",
                        start_epoch, state_path)
        else:
            LOGGER.info("no train_state next to %s: warm-start only",
                        cfg.resume_from)
    sched = LrSchedule(cfg.lr_scheduler, cfg.lr, cfg.lr_decay, cfg.lr_decay_step,
                       cfg.lr_patience, cfg.lr_mode_strategy)
    rng = jax.random.PRNGKey(cfg.tseed)
    nprng = np.random.RandomState(cfg.tseed)

    n_proc = max(cfg.num_processes, 1)
    if n_proc > 1:
        # every host contributes pad_n local rows; the global batch is
        # pad_n * n_proc, assembled per-host with make_array_from_process_local
        # data so the jit step sees ONE global sharded array (DDP-equivalent:
        # effective global batch = batch_size * world, train_multigpu.py:186-205)
        total_step = len(train_ds) // (cfg.batch_size * n_proc)  # drop tail: all
        # hosts must execute the same number of collective steps
    else:
        total_step = -(-len(train_ds) // cfg.batch_size)
    LOGGER.info("total_step: %d", total_step)
    batch_sharding = shard_batch_spec(mesh)

    def to_global(flat):
        """Assemble per-host local rows of the packed batch into one global
        sharded array (multi-host); single-process stages it on device so the
        transfer happens on the prefetch thread, not inside the step call."""
        if n_proc == 1:
            return jax.device_put(flat, batch_sharding)
        global_shape = (flat.shape[0] * n_proc,) + flat.shape[1:]
        return jax.make_array_from_process_local_data(batch_sharding, flat,
                                                      global_shape)

    def stage_for(step_fn):
        def stage(b):
            feats, labels, n_valid = b
            mask = np.zeros(pad_n, np.float32)
            mask[:n_valid] = 1.0
            return to_global(step_fn.pack_batch(feats, labels, mask))
        return stage

    mega_sharding = NamedSharding(mesh, P(None, "data"))

    def to_global_many(flats):
        """(k, B_local, n_cols) stacked packed batches -> one global sharded
        array for the fused k-step dispatch (batch dim sharded, k replicated
        along the scan axis)."""
        if n_proc == 1:
            return jax.device_put(flats, mega_sharding)
        global_shape = (flats.shape[0], flats.shape[1] * n_proc, flats.shape[2])
        return jax.make_array_from_process_local_data(mega_sharding, flats,
                                                      global_shape)

    def grouped_stage_for(step_fn, sizes):
        """(group iterator, stage fn) for the fused path: the prefetch worker
        packs each batch of a group and ships the stack as ONE transfer."""
        import itertools as _it

        def gen_groups(batch_gen):
            it = iter(batch_gen)
            for size in sizes:
                grp = list(_it.islice(it, size))
                if not grp:
                    return
                yield grp

        def stage(grp):
            flats = []
            for feats, labels, n_valid in grp:
                mask = np.zeros(pad_n, np.float32)
                mask[:n_valid] = 1.0
                flats.append(step_fn.pack_batch(feats, labels, mask))
            if len(flats) == 1:
                return to_global(flats[0])
            return to_global_many(np.stack(flats))

        return gen_groups, stage
    curr_best_accuracy = 0.0
    curr_best_loc = 0
    best_epoch_accs: list[float] = []
    ckpts: list[str] = []
    is_main = jax.process_index() == 0

    # fused device-resident validation (r5, VERDICT r4 next #3): the valid
    # set is IDENTICAL at every interval (shuffle=False), so its packed
    # batches transfer once and stay on device; each interval then costs ONE
    # scanned eval dispatch + ONE small (n + n*5 floats) fetch instead of a
    # dispatch + loss/counts RPC per batch — the measured ~1.5 s/epoch floor
    # of trainm steady state (BASELINE.md r4 trainm row). Falls back to the
    # streamed per-batch sweep when the caller asked for out-of-core loading
    # (--dl_offsets) or the packed set exceeds the residency budget.
    valid_staged: list = []  # [device (n, B, n_cols)] or [None] = fallback
    VALID_RESIDENT_MB = 1024.0

    def _stage_valid_resident():
        if cfg.dl_offsets:  # valid file may not fit in RAM, let alone HBM
            valid_staged.append(None)
            return
        n_vbatch = (len(valid_ds) // (cfg.batch_size * n_proc) if n_proc > 1
                    else None)
        flats = []
        for bi, b in enumerate(valid_ds.batches(
                cfg.batch_size, False, nprng, pad_to=pad_n,
                shard=((cfg.process_id, n_proc) if n_proc > 1 else None),
                drop_remainder=n_proc > 1)):
            if n_vbatch is not None and bi >= n_vbatch:
                break
            feats, labels, n_valid = b
            mask = np.zeros(pad_n, np.float32)
            mask[:n_valid] = 1.0
            flats.append(eval_step.pack_batch(feats, labels, mask))
        if not flats or sum(f.nbytes for f in flats) / 1e6 > VALID_RESIDENT_MB:
            valid_staged.append(None)
            return
        valid_staged.append(to_global_many(np.stack(flats)))

    def run_valid(params):
        """Global-batch validation: losses and [n, correct, tp, fp, fn] counts
        are computed on-device over the full sharded batch and come back
        replicated, so every process derives IDENTICAL metrics — and therefore
        identical checkpoint/early-stop decisions (divergent decisions would
        strand the other ranks inside a collective)."""
        if not valid_staged:
            _stage_valid_resident()
        if valid_staged[0] is not None:
            losses, counts = eval_step.packed_many(params, valid_staged[0])
            vloss = float(np.mean(np.asarray(losses)))
            csum = np.asarray(counts, np.float64).sum(axis=0)
        else:
            vlosses = []
            csum = np.zeros(5, np.float64)
            n_vbatch = (len(valid_ds) // (cfg.batch_size * n_proc)
                        if n_proc > 1 else None)
            staged = _prefetch(valid_ds.batches(
                cfg.batch_size, False, nprng, pad_to=pad_n,
                shard=((cfg.process_id, n_proc) if n_proc > 1 else None),
                drop_remainder=n_proc > 1), stage_for(eval_step))
            try:
                for bi, flat in enumerate(staged):
                    if n_vbatch is not None and bi >= n_vbatch:
                        break
                    loss, _pred, counts = eval_step.packed(params, flat)
                    vlosses.append(float(loss))
                    csum += np.asarray(counts, np.float64)
            finally:
                staged.close()
            vloss = float(np.mean(vlosses)) if vlosses else 0.0
        n, correct, tp, fp, fn = csum
        acc = correct / n if n else 0.0
        prec = tp / (tp + fp) if (tp + fp) else 0.0
        rec = tp / (tp + fn) if (tp + fn) else 0.0
        return vloss, acc, prec, rec

    stop = False
    epoch_walls: list[float] = []  # epoch 1 includes compiles; 2+ are steady-state
    for epoch in range(start_epoch, cfg.max_epoch_num):
        epoch_t0 = time.time()
        curr_best_epoch = 0.0
        accs_per_epoch: list[float] = []
        no_best_model = True
        tlosses: list[float] = []
        start = time.time()
        shard = ((cfg.process_id, n_proc) if n_proc > 1 else None)
        i = 0  # steps completed this epoch
        # fused dispatch: the group schedule caps every epoch at total_step
        # steps (so multi-host ranks execute equal collective step counts) and
        # never crosses a logging boundary — per-step numerics and the rng
        # stream are identical to single-step dispatch (gated in
        # tests/test_training.py)
        gen_groups, stage_g = grouped_stage_for(
            train_step, _fuse_schedule(total_step, cfg.step_interval,
                                       max(1, cfg.step_fuse)))
        staged_train = _prefetch(gen_groups(train_ds.batches(
            cfg.batch_size, True, nprng, pad_to=pad_n, shard=shard,
            drop_remainder=n_proc > 1)), stage_g)
        try:
            for gflat in staged_train:
                k_i = gflat.shape[0] if gflat.ndim == 3 else 1
                subs = []
                for _ in range(k_i):  # same split sequence as single-step
                    rng, sub = jax.random.split(rng)
                    subs.append(sub)
                # keep losses on device; fetch only at logging boundaries (a
                # float() per step is a host sync per step — expensive on
                # remote runtimes)
                if k_i == 1:
                    params, opt_state, loss = train_step.packed(
                        params, opt_state, gflat, subs[0])
                    tlosses.append(loss[None])
                else:
                    params, opt_state, losses = train_step.packed_many(
                        params, opt_state, gflat, jnp.stack(subs))
                    tlosses.append(losses)
                i += k_i
                if i % cfg.step_interval == 0 or i == total_step:
                    tloss_mean = (float(jnp.mean(jnp.concatenate(tlosses)))
                                  if tlosses else 0.0)
                    v_meanloss, v_acc, v_prec, v_rec = run_valid(params)
                    accs_per_epoch.append(v_acc)
                    if v_acc > curr_best_epoch:
                        curr_best_epoch = v_acc
                        if curr_best_epoch > curr_best_accuracy - 0.0002 and is_main:
                            p = (model_dir + cfg.model_type
                                 + ".b{}_epoch{}.ckpt.npz".format(cfg.seq_len, epoch + 1))
                            save_params(p, jax.device_get(params))
                            ckpts.append(p)
                            if cfg.save_opt_state:
                                save_train_state(
                                    p.replace(".ckpt.npz", ".train_state.npz"),
                                    jax.device_get(opt_state), epoch + 1)
                            if curr_best_epoch > curr_best_accuracy:
                                curr_best_accuracy = curr_best_epoch
                                curr_best_loc = epoch + 1
                                no_best_model = False
                        elif curr_best_epoch > curr_best_accuracy:
                            curr_best_accuracy = curr_best_epoch
                            curr_best_loc = epoch + 1
                            no_best_model = False
                        if best_epoch_accs and curr_best_epoch > best_epoch_accs[-1] and is_main:
                            p = (model_dir + cfg.model_type
                                 + ".betterthanlast.b{}_epoch{}.ckpt.npz".format(
                                     cfg.seq_len, epoch + 1))
                            save_params(p, jax.device_get(params))
                    LOGGER.info(
                        "Epoch [%d/%d], Step [%d/%d]; LR: %.4e; TrainLoss: %.4f; "
                        "ValidLoss: %.4f, Acc: %.4f, Prec: %.4f, Reca: %.4f, "
                        "CurrE_best_acc: %.4f, Best_acc: %.4f; Time: %.2fs",
                        epoch + 1, cfg.max_epoch_num, i, total_step, sched.lr,
                        tloss_mean, v_meanloss, v_acc, v_prec, v_rec,
                        curr_best_epoch, curr_best_accuracy, time.time() - start)
                    tlosses = []
                    start = time.time()
        finally:
            staged_train.close()
        epoch_walls.append(time.time() - epoch_t0)
        new_lr = sched.epoch_end(accs_per_epoch or [0.0])
        opt_state = set_learning_rate(opt_state, new_lr)
        best_epoch_accs.append(curr_best_epoch)
        if no_best_model and epoch >= cfg.min_epoch_num - 1:
            LOGGER.info("early stop!")
            stop = True
        if stop:
            break
    LOGGER.info("[main]train costs %.1f seconds, best accuracy: %s (epoch %d)",
                time.time() - t0, curr_best_accuracy, curr_best_loc)
    return {"best_accuracy": curr_best_accuracy, "best_epoch": curr_best_loc,
            "ckpts": ckpts, "epoch_wall_s": epoch_walls}
