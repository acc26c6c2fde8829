"""Training-loop tests: separable synthetic data must train to high accuracy;
optimizers step; the train step shards over the 8-device CPU mesh."""

import glob

import jax
import numpy as np
import optax
import pytest

from ccsmeth_tpu.models import AttRNNConfig, init_attrnn
from ccsmeth_tpu.training import TrainConfig, train
from ccsmeth_tpu.training.data import FeatureDataset, load_feature_tsv
from ccsmeth_tpu.training.optim import LrSchedule, build_optimizer, set_learning_rate
from ccsmeth_tpu.training.train import binary_metrics, make_train_step


def _write_feature_tsv(path, n=300, seed=0, seq_len=21):
    """Separable synthetic features: label-1 rows get an ipd shift at the center."""
    rng = np.random.RandomState(seed)
    bases = "ACGT"
    with open(path, "w") as f:
        for i in range(n):
            label = i % 2
            kmer = "".join(rng.choice(list(bases), seq_len))
            kmer = kmer[:10] + "CG" + kmer[12:]
            ipd = rng.randn(seq_len)
            pw = rng.randn(seq_len)
            if label:
                ipd[8:13] += 2.0
            row = [
                "chr1", str(1000 + i), "+", "read/{}/ccs".format(i), str(50 + i),
                kmer, "10", ",".join(str(round(x, 6)) for x in ipd), ".",
                ",".join(str(round(x, 6)) for x in pw), ".", ".", ".",
                kmer[::-1], "9", ",".join(str(round(x, 6)) for x in rng.randn(seq_len)),
                ".", ",".join(str(round(x, 6)) for x in rng.randn(seq_len)), ".", ".",
                ".", str(label),
            ]
            f.write("\t".join(row) + "\n")


def test_load_feature_tsv(tmp_path):
    p = str(tmp_path / "f.tsv")
    _write_feature_tsv(p, n=40)
    data = load_feature_tsv(p)
    assert data["kmer"].shape == (40, 21)
    assert data["sns"].shape == (40, 4)
    assert data["labels"].sum() == 20
    ds = FeatureDataset(data)
    batches = list(ds.batches(16, True, np.random.RandomState(0), pad_to=16))
    assert len(batches) == 3
    assert batches[-1][2] == 8  # ragged tail n_valid
    assert batches[-1][0]["kmer"].shape == (16, 21)


def test_dataset_host_sharding(tmp_path):
    p = str(tmp_path / "f.tsv")
    _write_feature_tsv(p, n=64)
    ds = FeatureDataset(load_feature_tsv(p))
    b0 = list(ds.batches(16, False, np.random.RandomState(0), shard=(0, 2)))
    b1 = list(ds.batches(16, False, np.random.RandomState(0), shard=(1, 2)))
    assert len(b0) == 2 and len(b1) == 2
    assert not np.array_equal(b0[0][0]["ipd_means"], b1[0][0]["ipd_means"])


@pytest.mark.parametrize("optim", ["Adam", "RMSprop", "SGD", "Ranger", "LookaheadAdam"])
def test_optimizers_step(optim):
    cfg = AttRNNConfig(num_layers=1, hidden_size=16, dropout_rate=0)
    params = init_attrnn(0, cfg)
    tx = build_optimizer(optim, 1e-3)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: np.ones_like(x) * 0.01, params)
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    # something changed
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, params, new_params), 0.0)
    assert diff > 0
    # lr update works
    state = set_learning_rate(state, 5e-4)


def test_lr_schedules():
    s = LrSchedule("StepLR", 0.1, decay=0.5, decay_step=2)
    assert s.epoch_end([0.5]) == 0.1
    assert s.epoch_end([0.5]) == 0.05
    p = LrSchedule("ReduceLROnPlateau", 0.1, decay=0.1, patience=1,
                   mode_strategy="max")
    assert p.epoch_end([0.5]) == 0.1  # first epoch sets best
    assert p.epoch_end([0.5]) == 0.1  # bad 1 <= patience
    assert abs(p.epoch_end([0.5]) - 0.01) < 1e-12  # bad 2 > patience -> decay


def test_binary_metrics():
    labels = np.array([1, 1, 0, 0, 1])
    preds = np.array([1, 0, 0, 1, 1])
    acc, prec, rec = binary_metrics(labels, preds)
    assert abs(acc - 0.6) < 1e-9
    assert abs(prec - 2 / 3) < 1e-9
    assert abs(rec - 2 / 3) < 1e-9


def test_train_step_sharded_multidevice():
    assert jax.device_count() == 8
    cfg = AttRNNConfig(num_layers=1, hidden_size=16, dropout_rate=0.1)
    params = init_attrnn(0, cfg)
    tx = build_optimizer("Adam", 1e-3)
    step, mesh = make_train_step(cfg, tx, pos_weight=1.0)
    assert mesh.devices.size == 8
    opt_state = tx.init(params)
    B, L = 16, 21
    rng = np.random.RandomState(0)
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.full((B, L), 5.0, np.float32)
        feats["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["pw_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["ipd_stds" + s] = np.zeros((B, L), np.float32)
        feats["pw_stds" + s] = np.zeros((B, L), np.float32)
        feats["sns" + s] = np.zeros((B, 4), np.float32)
        feats["maps" + s] = np.zeros((B, L), np.float32)
    labels = rng.randint(0, 2, B).astype(np.int32)
    mask = np.ones(B, np.float32)
    key = jax.random.PRNGKey(0)
    p1, o1, l1 = step(params, opt_state, feats, labels, mask, key)
    p2, _o2, l2 = step(p1, o1, feats, labels, mask, key)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1) + 1.0
    # packed single-array companion must be bit-identical to the dict step
    flat = step.pack_batch(feats, labels, mask)
    pp, _op, lp = step.packed(params, opt_state, flat, key)
    assert float(lp) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(pp),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step_fused_matches_per_batch():
    """The fused validation sweep (eval_step.packed_many, one scanned device
    call over the staged (n, B, cols) valid set — r5) must reproduce the
    per-batch path's losses and metric counts exactly."""
    from ccsmeth_tpu.training.train import make_eval_step

    cfg = AttRNNConfig(num_layers=1, hidden_size=16, dropout_rate=0.0)
    params = init_attrnn(3, cfg)
    estep, _mesh = make_eval_step(cfg, pos_weight=1.5)
    rng = np.random.RandomState(1)
    B, L, n = 16, 21, 3
    flats = []
    ref_losses, ref_counts = [], []
    for i in range(n):
        feats = {}
        for s in ("", "2"):
            feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
            feats["kpass" + s] = np.full((B, L), 5.0, np.float32)
            feats["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
            feats["pw_means" + s] = rng.randn(B, L).astype(np.float32)
            feats["ipd_stds" + s] = np.zeros((B, L), np.float32)
            feats["pw_stds" + s] = np.zeros((B, L), np.float32)
            feats["sns" + s] = np.zeros((B, 4), np.float32)
            feats["maps" + s] = np.zeros((B, L), np.float32)
        labels = rng.randint(0, 2, B).astype(np.int32)
        mask = np.ones(B, np.float32)
        mask[B - 1 - i:] = 0.0  # exercise padded rows
        flat = estep.pack_batch(feats, labels, mask)
        flats.append(flat)
        loss, _pred, counts = estep.packed(params, flat)
        ref_losses.append(float(loss))
        ref_counts.append(np.asarray(counts))
    losses, counts = estep.packed_many(params, np.stack(flats))
    np.testing.assert_array_equal(np.asarray(losses),
                                  np.asarray(ref_losses, np.float32))
    np.testing.assert_array_equal(np.asarray(counts), np.stack(ref_counts))


def test_valid_set_staged_on_device_once(tmp_path, monkeypatch):
    """The r5 fused validation stages the valid set on device ONCE and reuses
    it at every interval — the mechanism behind the trainm steady-epoch win
    (one scanned dispatch per interval instead of per-batch RPCs). Gate: the
    valid dataset's batches() must be iterated exactly once across a run
    with many validation intervals."""
    from ccsmeth_tpu.training import data as data_mod
    from ccsmeth_tpu.training import TrainConfig, train

    tr, va = str(tmp_path / "tr.tsv"), str(tmp_path / "va.tsv")
    _write_feature_tsv(tr, 128, seed=1)
    _write_feature_tsv(va, 64, seed=2)
    orig = data_mod.FeatureDataset.batches
    calls = {"valid": 0}

    def counting(self, batch_size, shuffle, *a, **k):
        if not shuffle:
            calls["valid"] += 1
        return orig(self, batch_size, shuffle, *a, **k)

    monkeypatch.setattr(data_mod.FeatureDataset, "batches", counting)
    cfg = TrainConfig(train_file=tr, valid_file=va,
                      model_dir=str(tmp_path / "m"), layer_rnn=1, hid_rnn=16,
                      batch_size=32, max_epoch_num=3, min_epoch_num=3,
                      step_interval=2, tseed=5)
    train(cfg)
    # 3 epochs x 2 intervals each = 6 run_valid calls, 1 staging iteration
    assert calls["valid"] == 1


def test_train_e2e_learns(tmp_path):
    tr = str(tmp_path / "train.tsv")
    va = str(tmp_path / "valid.tsv")
    _write_feature_tsv(tr, n=600, seed=1)
    _write_feature_tsv(va, n=120, seed=2)
    cfg = TrainConfig(
        train_file=tr, valid_file=va, model_dir=str(tmp_path / "models"),
        model_type="attbigru2s", layer_rnn=1, hid_rnn=24, batch_size=64,
        dropout_rate=0.1, max_epoch_num=12, min_epoch_num=4, step_interval=5,
        lr=0.01, lr_decay=0.5, lr_decay_step=4, tseed=7,
    )
    result = train(cfg)
    assert result["best_accuracy"] > 0.9
    saved = glob.glob(str(tmp_path / "models" / "attbigru2s.b21_epoch*.ckpt.npz"))
    assert saved
    # saved ckpt is loadable and usable for inference
    from ccsmeth_tpu.models.params_io import load_params
    from ccsmeth_tpu.models import apply_attrnn

    params = load_params(sorted(saved)[-1])
    mcfg = AttRNNConfig(num_layers=1, hidden_size=24, dropout_rate=0)
    data = load_feature_tsv(va)
    feats = {k: v[:32] for k, v in data.items() if k != "labels"}
    _logits, probs = apply_attrnn(params, mcfg, feats)
    preds = np.argmax(np.asarray(probs), axis=1)
    acc = float(np.mean(preds == data["labels"][:32]))
    assert acc > 0.85


def test_train_single_strand(tmp_path):
    """trainm's single-strand family (attbigru1s) trains on 14-col TSVs."""
    import numpy as _np

    rng = _np.random.RandomState(0)
    for name, n in (("tr", 200), ("va", 60)):
        with open(str(tmp_path / (name + ".tsv")), "w") as f:
            for i in range(n):
                label = i % 2
                kmer = "".join(rng.choice(list("ACGT"), 21))
                ipd = rng.randn(21)
                if label:
                    ipd[8:13] += 2.5
                f.write("\t".join([
                    "chr1", str(i), "+", "r/{}/ccs".format(i), str(i), kmer, "9",
                    ",".join(str(round(x, 6)) for x in ipd), ".",
                    ",".join(str(round(x, 6)) for x in rng.randn(21)), ".", ".",
                    ".", str(label)]) + "\n")
    cfg = TrainConfig(
        train_file=str(tmp_path / "tr.tsv"), valid_file=str(tmp_path / "va.tsv"),
        model_dir=str(tmp_path / "m"), model_type="attbigru1s", layer_rnn=1,
        hid_rnn=16, batch_size=32, dropout_rate=0.1, max_epoch_num=8,
        min_epoch_num=3, step_interval=5, lr=0.01, tseed=1)
    result = train(cfg)
    assert result["best_accuracy"] > 0.85
    assert glob.glob(str(tmp_path / "m" / "attbigru1s.b21_epoch*.ckpt.npz"))


def test_resume_with_optimizer_state(tmp_path):
    tr = str(tmp_path / "tr.tsv")
    va = str(tmp_path / "va.tsv")
    _write_feature_tsv(tr, n=200, seed=1)
    _write_feature_tsv(va, n=60, seed=2)
    base = dict(train_file=tr, valid_file=va, model_dir=str(tmp_path / "m"),
                model_type="attbigru2s", layer_rnn=1, hid_rnn=16, batch_size=64,
                dropout_rate=0.1, step_interval=3, lr=0.01, tseed=5,
                save_opt_state=True)
    r1 = train(TrainConfig(**base, max_epoch_num=2, min_epoch_num=1))
    assert r1["ckpts"]
    last = sorted(r1["ckpts"])[-1]
    state = last.replace(".ckpt.npz", ".train_state.npz")
    import os

    assert os.path.exists(state)
    # resume continues from the saved epoch (start_epoch >= 2 -> runs epochs 3..4)
    base2 = dict(base, model_dir=str(tmp_path / "m2"))
    r2 = train(TrainConfig(**base2, max_epoch_num=4, min_epoch_num=1,
                           resume_from=last))
    assert r2["best_epoch"] == 0 or r2["best_epoch"] > 2 or r2["best_accuracy"] > 0
    # resumed run must not restart at epoch 1: its ckpts are named epoch>=3
    for p in r2["ckpts"]:
        import re

        m = re.search(r"epoch(\d+)", p)
        assert int(m.group(1)) >= 3


def test_streaming_dataset_matches_inmemory(tmp_path):
    """StreamingFeatureDataset yields the same multiset of rows as FeatureDataset
    (chunked windowed shuffle; small chunk_rows forces many chunks + carry)."""
    from ccsmeth_tpu.training.data import StreamingFeatureDataset

    p = str(tmp_path / "f.tsv")
    _write_feature_tsv(p, n=333)
    mem = FeatureDataset(load_feature_tsv(p))
    stream = StreamingFeatureDataset(p, chunk_rows=50)
    assert len(stream) == len(mem) == 333

    def collect(ds, shuffle):
        rows = []
        for feats, labels, n_valid in ds.batches(64, shuffle,
                                                 np.random.RandomState(0),
                                                 pad_to=64):
            for j in range(n_valid):
                rows.append((float(feats["ipd_means"][j].sum()), int(labels[j])))
        return rows

    got = collect(stream, shuffle=True)
    want = collect(mem, shuffle=False)
    assert len(got) == len(want)
    assert sorted(got) == sorted(want)
    # shuffled stream is not in file order
    assert got != want


def test_streaming_dataset_train_e2e(tmp_path):
    """train() with dl_offsets=True (streaming loader) learns the separable set."""
    tr = str(tmp_path / "t.tsv")
    va = str(tmp_path / "v.tsv")
    _write_feature_tsv(tr, n=1600, seed=0)
    _write_feature_tsv(va, n=400, seed=1)
    from ccsmeth_tpu.training.train import TrainConfig, train

    from ccsmeth_tpu.training import data as data_mod

    orig = data_mod.StreamingFeatureDataset

    class SmallChunks(orig):
        def __init__(self, path, seq_len=21, single_strand=False, chunk_rows=65536):
            super().__init__(path, seq_len, single_strand, chunk_rows=200)

    data_mod_train = __import__("ccsmeth_tpu.training.train", fromlist=["x"])
    data_mod_train.StreamingFeatureDataset, saved = SmallChunks,         data_mod_train.StreamingFeatureDataset
    try:
        res = train(TrainConfig(
            train_file=tr, valid_file=va, model_dir=str(tmp_path / "m"),
            model_type="attbigru2s", layer_rnn=2, hid_rnn=64, batch_size=256,
            max_epoch_num=2, min_epoch_num=1, step_interval=4, dl_offsets=True))
    finally:
        data_mod_train.StreamingFeatureDataset = saved
    assert res["best_accuracy"] > 0.7


def test_streaming_dataset_host_sharding(tmp_path):
    """shard=(i, n) on the streaming loader stripes batches disjointly (the
    multi-host DistributedSampler analog), unioning to all full batches."""
    from ccsmeth_tpu.training.data import StreamingFeatureDataset

    p = str(tmp_path / "f.tsv")
    _write_feature_tsv(p, n=320)
    ds = StreamingFeatureDataset(p, chunk_rows=100)
    rngs = [np.random.RandomState(3) for _ in range(3)]
    all_b = list(ds.batches(64, True, rngs[0]))
    s0 = list(ds.batches(64, True, rngs[1], shard=(0, 2)))
    s1 = list(ds.batches(64, True, rngs[2], shard=(1, 2)))
    assert len(s0) + len(s1) == len(all_b)
    key = lambda b: float(b[0]["ipd_means"].sum())
    assert sorted(map(key, s0 + s1)) == sorted(map(key, all_b))


def test_prefetch_order_close_and_errors():
    """_prefetch preserves item order, stops its worker on close, and re-raises
    staging/iterator errors on the consumer thread."""
    import threading
    import time as _time

    from ccsmeth_tpu.training.train import _prefetch

    # order preserved
    out = list(_prefetch(iter(range(20)), lambda x: x * 2, depth=3))
    assert out == [2 * i for i in range(20)]

    # early close stops the worker promptly (no deadlock on the bounded queue)
    n0 = threading.active_count()
    gen = _prefetch(iter(range(10_000)), lambda x: x, depth=2)
    assert next(gen) == 0
    gen.close()
    deadline = _time.time() + 5.0
    while threading.active_count() > n0 and _time.time() < deadline:
        _time.sleep(0.01)
    assert threading.active_count() <= n0

    # error in stage fn propagates
    def boom(x):
        if x == 3:
            raise RuntimeError("stage failed")
        return x

    with pytest.raises(RuntimeError, match="stage failed"):
        list(_prefetch(iter(range(10)), boom, depth=2))

    # error in the source iterator propagates
    def bad_iter():
        yield 1
        raise ValueError("iterator failed")

    with pytest.raises(ValueError, match="iterator failed"):
        list(_prefetch(bad_iter(), lambda x: x, depth=2))


def test_ckpt_shape_mismatch_fails_fast(tmp_path):
    """Loading a ckpt trained at one shape under different model flags raises a
    named-flag error up front instead of an opaque einsum failure in the jit
    (reference load_state_dict analog, train.py:110-116)."""
    from ccsmeth_tpu.models.params_io import save_params
    from ccsmeth_tpu.pipeline.call_mods import load_model_params

    small = AttRNNConfig(hidden_size=32, num_layers=2, dropout_rate=0.0)
    p = str(tmp_path / "small.ckpt.npz")
    save_params(p, jax.device_get(init_attrnn(0, small)))
    big = AttRNNConfig(hidden_size=256, num_layers=3, dropout_rate=0.0)
    with pytest.raises(ValueError, match="--model_type/--layer_rnn/--hid_rnn"):
        load_model_params(p, big)
    # matching config loads fine
    params = load_model_params(p, small)
    assert params["fc1"]["w"].shape == (4 * 32, 2)


def test_step_fuse_matches_single_step(tmp_path):
    """step_fuse>1 (k steps fused into one lax.scan dispatch) must reproduce
    the single-step loop exactly: same rng stream, same per-step math — losses
    and checkpoint params bit-for-bit (CPU fp32)."""
    from ccsmeth_tpu.models.params_io import load_params

    tr = str(tmp_path / "train.tsv")
    va = str(tmp_path / "valid.tsv")
    _write_feature_tsv(tr, n=300, seed=5)
    _write_feature_tsv(va, n=60, seed=6)
    results = {}
    for fuse in (1, 3):
        mdir = str(tmp_path / "m{}".format(fuse))
        cfg = TrainConfig(
            train_file=tr, valid_file=va, model_dir=mdir,
            model_type="attbigru2s", layer_rnn=1, hid_rnn=16, batch_size=32,
            dropout_rate=0.3, max_epoch_num=2, min_epoch_num=2,
            step_interval=7, lr=0.01, tseed=11, step_fuse=fuse,
        )
        res = train(cfg)
        ck = sorted(glob.glob(mdir + "/attbigru2s.b21_epoch*.ckpt.npz"))
        results[fuse] = (res["best_accuracy"], ck)
    acc1, ck1 = results[1]
    acc3, ck3 = results[3]
    assert acc1 == acc3
    assert [p.split("/")[-1] for p in ck1] == [p.split("/")[-1] for p in ck3]
    p1 = load_params(ck1[-1])
    p3 = load_params(ck3[-1])
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_transfer_bf16_wire_rows(tmp_path):
    """--train_transfer bf16 (halved per-step wire bytes): labels/mask stay
    EXACT through the bf16 row (0/1 values), features round to bf16, and the
    e2e trainer still learns the separable set."""
    import ml_dtypes

    from ccsmeth_tpu.training.train import _batch_layout, _pack_cols, _unpack_cols

    cfg = AttRNNConfig(num_layers=1, hidden_size=16)
    fields = _batch_layout(cfg)
    rng = np.random.RandomState(0)
    B, L = 8, 21
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.full((B, L), 7.0, np.float32)
        for k in ("ipd_means", "pw_means", "ipd_stds", "pw_stds", "maps"):
            feats[k + s] = rng.randn(B, L).astype(np.float32)
        feats["sns" + s] = rng.randn(B, 4).astype(np.float32)
    labels = rng.randint(0, 2, B).astype(np.int32)
    mask = (rng.rand(B) < 0.8).astype(np.float32)
    flat16 = _pack_cols(fields, feats, labels, mask,
                        dtype=np.dtype(ml_dtypes.bfloat16))
    assert flat16.dtype == ml_dtypes.bfloat16
    import jax.numpy as jnp

    f2, l2, m2 = _unpack_cols(jnp.asarray(flat16), fields)
    np.testing.assert_array_equal(np.asarray(l2), labels)
    np.testing.assert_array_equal(np.asarray(m2), mask)
    for k in feats:
        np.testing.assert_allclose(np.asarray(f2[k]), feats[k],
                                   rtol=8e-3, atol=8e-3)

    # e2e: still learns
    tr = str(tmp_path / "train.tsv")
    va = str(tmp_path / "valid.tsv")
    _write_feature_tsv(tr, n=600, seed=1)
    _write_feature_tsv(va, n=120, seed=2)
    cfg = TrainConfig(
        train_file=tr, valid_file=va, model_dir=str(tmp_path / "models"),
        model_type="attbigru2s", layer_rnn=1, hid_rnn=24, batch_size=64,
        dropout_rate=0.1, max_epoch_num=12, min_epoch_num=4, step_interval=5,
        lr=0.01, lr_decay=0.5, lr_decay_step=4, tseed=7,
        train_transfer="bf16",
    )
    result = train(cfg)
    assert result["best_accuracy"] > 0.9


def test_train_transfer_packed_roundtrip():
    """--train_transfer packed quantized byte rows: kmer (4-bit), npass (u16
    scalar), labels and mask round-trip EXACTLY; int8 kinetics within 1/32;
    sns within bf16 rounding; maps within 1/510; disabled channels come back
    as zeros."""
    import jax.numpy as jnp

    from ccsmeth_tpu.training.train import _pack_rows_q, _q_fields, _unpack_rows_q

    cfg = AttRNNConfig(num_layers=1, hidden_size=16,
                       is_stds=True, is_sn=True, is_map=True)
    fields = _q_fields(cfg)
    rng = np.random.RandomState(0)
    B, L = 8, 21
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.repeat(
            rng.randint(1, 300, (B, 1)).astype(np.float32), L, axis=1)
        for k in ("ipd_means", "pw_means", "ipd_stds", "pw_stds"):
            feats[k + s] = rng.randn(B, L).astype(np.float32)
        feats["sns" + s] = rng.randn(B, 4).astype(np.float32)
        feats["maps" + s] = rng.rand(B, L).astype(np.float32)
    labels = rng.randint(0, 2, B).astype(np.int32)
    mask = (rng.rand(B) < 0.8).astype(np.float32)

    buf = _pack_rows_q(fields, feats, labels, mask)
    assert buf.dtype == np.uint8
    assert buf.shape == (B, sum(nb for _k, _kind, nb in fields) + 2)
    f2, l2, m2 = _unpack_rows_q(jnp.asarray(buf), fields, cfg)
    np.testing.assert_array_equal(np.asarray(l2), labels)
    np.testing.assert_array_equal(np.asarray(m2), mask)
    for s in ("", "2"):
        np.testing.assert_array_equal(np.asarray(f2["kmer" + s]),
                                      feats["kmer" + s])
        np.testing.assert_array_equal(np.asarray(f2["kpass" + s]),
                                      feats["kpass" + s])
        for k in ("ipd_means", "pw_means", "ipd_stds", "pw_stds"):
            np.testing.assert_allclose(np.asarray(f2[k + s]), feats[k + s],
                                       atol=1.0 / 32)
        np.testing.assert_allclose(np.asarray(f2["sns" + s]), feats["sns" + s],
                                   rtol=8e-3, atol=8e-3)
        np.testing.assert_allclose(np.asarray(f2["maps" + s]), feats["maps" + s],
                                   atol=1.0 / 510)

    # flagship config (npass only): disabled channels come back as zeros and
    # the wire row is 112 B/sample (vs 1216 fp32)
    cfg_flag = AttRNNConfig(num_layers=1, hidden_size=16)
    fields_flag = _q_fields(cfg_flag)
    assert sum(nb for _k, _kind, nb in fields_flag) + 2 == 112
    buf2 = _pack_rows_q(fields_flag, feats, labels, mask)
    f3, _l3, _m3 = _unpack_rows_q(jnp.asarray(buf2), fields_flag, cfg_flag)
    assert np.all(np.asarray(f3["ipd_stds"]) == 0)
    assert np.all(np.asarray(f3["sns2"]) == 0)
    assert np.all(np.asarray(f3["maps2"]) == 0)


def test_train_transfer_packed_learns(tmp_path):
    """--train_transfer packed e2e: the trainer still learns the separable set
    through quantized wire rows."""
    tr = str(tmp_path / "train.tsv")
    va = str(tmp_path / "valid.tsv")
    _write_feature_tsv(tr, n=600, seed=1)
    _write_feature_tsv(va, n=120, seed=2)
    cfg = TrainConfig(
        train_file=tr, valid_file=va, model_dir=str(tmp_path / "models"),
        model_type="attbigru2s", layer_rnn=1, hid_rnn=24, batch_size=64,
        dropout_rate=0.1, max_epoch_num=12, min_epoch_num=4, step_interval=5,
        lr=0.01, lr_decay=0.5, lr_decay_step=4, tseed=7,
        train_transfer="packed",
    )
    result = train(cfg)
    assert result["best_accuracy"] > 0.9
