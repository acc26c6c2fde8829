"""Packed single-put transfer path (parallel/mesh.py).

Through a remote-attached device every ``device_put`` is an RPC with fixed
latency, so ``make_predict_fn``'s production ``dispatch`` packs all feature
channels of a site into one contiguous byte row and ships ONE (B, row_bytes)
uint8 array; the jit unpacks with static slices + bitcasts. These tests gate
bit-equality of the packed path against the per-channel path (and the h0
replay variant) on CPU, across transfer dtypes and optional channels.
"""

import dataclasses

import ml_dtypes
import numpy as np
import pytest

from ccsmeth_tpu.models import AttRNNConfig, init_attrnn
from ccsmeth_tpu.parallel.mesh import make_predict_fn
from ccsmeth_tpu.pipeline.call_mods import _apply_for


from tests.synth import example_feats


def _feats(B, L=21, seed=0):
    return example_feats(B, L, seed, optional="random")


@pytest.mark.parametrize("tdt", [np.float32, np.dtype(ml_dtypes.bfloat16)])
def test_packed_equals_unpacked(tdt):
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(1234, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg,
                              transfer_dtype=tdt)
    feats = _feats(48)
    packed = np.asarray(predict.collect(predict.dispatch(feats)))
    unpacked = np.asarray(predict.collect(predict.dispatch_unpacked(feats)))
    np.testing.assert_array_equal(packed, unpacked)


def test_packed_with_optional_channels():
    cfg = AttRNNConfig(dropout_rate=0.0, is_stds=True, is_sn=True, is_map=True)
    params = init_attrnn(7, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    feats = _feats(16)
    packed = np.asarray(predict.collect(predict.dispatch(feats)))
    unpacked = np.asarray(predict.collect(predict.dispatch_unpacked(feats)))
    np.testing.assert_array_equal(packed, unpacked)
    # all-channel fp32 row: 2 strands x (11B 4-bit-packed kmer + 4B kpass
    # + 4*21*4B kinetics + 4*4B sn + 21*4B map)
    assert predict.row_bytes == 2 * (11 + 4 + 4 * 21 * 4 + 16 + 84)


def test_dispatch_many_equals_per_batch():
    """Fused k-batch megabatch dispatch (one put + one lax.scan device call,
    mesh.py dispatch_many) is bit-equal to k independent packed dispatches."""
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(1234, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    fb = [_feats(48, seed=s) for s in range(4)]
    ref = [np.asarray(predict(f)) for f in fb]
    arr = np.asarray(predict.collect(predict.dispatch_many(fb)))
    assert arr.shape == (4, 48, 2)
    for i in range(4):
        np.testing.assert_array_equal(arr[i], ref[i])


def test_dispatch_many_with_h0():
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(5, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    rng = np.random.RandomState(3)
    fb = []
    for s in range(3):
        f = _feats(16, seed=s)
        f["h0"] = rng.randn(6, 16, 256).astype(np.float32)
        f["h0_2"] = rng.randn(6, 16, 256).astype(np.float32)
        fb.append(f)
    ref = [np.asarray(predict(f)) for f in fb]
    arr = np.asarray(predict.collect(predict.dispatch_many(fb)))
    for i in range(3):
        np.testing.assert_array_equal(arr[i], ref[i])


def test_int8_kinetics_transfer_row_shrink_and_drift():
    """Opt-in int8 kinetics transfer (mesh.py kinetics_quant): rows shrink
    198 -> 110 bytes/site (4-bit kmer + u16 npass + int8 kinetics) and prob
    drift vs the fp32 transfer stays within a few ML bytes on standardized
    (z-score-scale) inputs."""
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(1234, cfg)
    pf = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg,
                         transfer_dtype=np.dtype(ml_dtypes.bfloat16))
    pq = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg,
                         kinetics_quant="int8")
    # production bf16 row: 2x(11 kmer4 + 4 kpass + 42+42 bf16 kinetics);
    # quant row: 2x(11 kmer4 + 2 u16 npass + 21+21 int8 kinetics)
    assert pf.row_bytes == 198 and pq.row_bytes == 110
    feats = _feats(256)
    ref = np.asarray(pf(feats))
    got = np.asarray(pq(feats))
    drift = float(np.max(np.abs(got - ref)))
    assert drift < 4.0 / 256, "int8 transfer drift {} > 4 ML bytes".format(drift)
    # fused megabatch path carries the quantized rows identically
    arr = np.asarray(pq.collect(pq.dispatch_many([feats, feats])))
    np.testing.assert_array_equal(arr[0], got)
    pf.close()
    pq.close()


def test_int8_transfer_requires_standardized_norm(tmp_path):
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam

    cfg = CallModsConfig(model_file="x.npz", norm="min-max",
                         transfer_quant="int8")
    with pytest.raises(ValueError, match="standardized"):
        call_mods_bam(cfg, "in.bam", str(tmp_path / "o"))


def test_fused_dispatcher_partial_group_and_order():
    """_FusedDispatcher pads partial groups (single executable) and resolves
    tokens to the right per-batch results in any collect order."""
    from ccsmeth_tpu.pipeline.call_mods import _FusedDispatcher

    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(11, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    fb = [_feats(32, seed=s) for s in range(5)]
    ref = [np.asarray(predict(f)) for f in fb]
    fz = _FusedDispatcher(predict, 4)
    toks = [fz.dispatch(f) for f in fb]  # 1 full group + 1 buffered
    assert _FusedDispatcher.attached(toks[0])
    assert not _FusedDispatcher.attached(toks[4])
    for i in reversed(range(5)):  # out-of-order collection
        np.testing.assert_array_equal(fz.collect(toks[i]), ref[i])


def test_packed_with_h0_replay():
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(5, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    rng = np.random.RandomState(3)
    feats = _feats(16)
    feats["h0"] = rng.randn(6, 16, 256).astype(np.float32)
    feats["h0_2"] = rng.randn(6, 16, 256).astype(np.float32)
    packed = np.asarray(predict.collect(predict.dispatch(feats)))
    unpacked = np.asarray(predict.collect(predict.dispatch_unpacked(feats)))
    np.testing.assert_array_equal(packed, unpacked)
    # h0 must actually change the result (guards against silently dropping it)
    nz = np.asarray(predict.collect(predict.dispatch(_feats(16))))
    assert not np.array_equal(packed, nz)


def test_pipelined_async_dispatch_order_and_equality():
    """dispatch_many_async is a two-stage pipeline (pack pool -> single FIFO
    put thread, mesh.py); results must stay in order and bit-equal to the
    synchronous dispatch_many across several in-flight groups."""
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(21, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    groups = [[_feats(32, seed=4 * g + j) for j in range(4)] for g in range(3)]
    ref = [np.asarray(predict.collect(predict.dispatch_many(g)))
           for g in groups]
    futs = [predict.dispatch_many_async(g) for g in groups]  # 3 in flight
    for g, fut in enumerate(futs):
        np.testing.assert_array_equal(
            np.asarray(predict.collect(fut)), ref[g])
    predict.close()


def test_u16_npass_wire_exact_for_integer_passes():
    """The quant path ships npass as uint16 (exact for the integer 'fn'/'rn'
    BAM tags, features/extract.py:190); probs must be bit-identical between
    npass sent as fp32 (no-quant row) and as u16 (quant row) when kinetics
    quantization itself is bypassed by zero kinetics."""
    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(9, cfg)
    feats = _feats(16)
    for s in ("", "2"):  # zero kinetics: int8-quant of 0.0 is exact
        feats["ipd_means" + s][:] = 0.0
        feats["pw_means" + s][:] = 0.0
        feats["kpass" + s][:] = 60001.0  # extreme integer pass count
    # both sides on the bf16-transfer fast path (same bf16 result fetch), so
    # equality isolates the npass WIRE encoding: fp32 kpass vs u16 kpass
    pf = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg,
                         transfer_dtype=np.dtype(ml_dtypes.bfloat16))
    pq = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg,
                         kinetics_quant="int8")
    np.testing.assert_array_equal(np.asarray(pf(feats)),
                                  np.asarray(pq(feats)))


def test_mlbyte_fetch_matches_host_ml_bytes():
    """fetch_mode='mlbyte' (r5): the jit epilogue ships floor(p1n*256) uint8
    ML bytes (1 B/site result RPC). Must match the host-side computation
    (utils/codecs.convert_probs_to_mltag on round(p1n, 6)) except within the
    ~5e-7 six-decimal rounding band of an ML boundary (≤1 byte)."""
    from ccsmeth_tpu.utils.codecs import convert_probs_to_mltag

    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(1234, cfg)
    pp = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    pm = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg,
                         fetch_mode="mlbyte")
    feats = _feats(256)
    probs = np.asarray(pp(feats), np.float64)
    host_ml = np.asarray(convert_probs_to_mltag(
        [round(float(p1 / (p0 + p1)), 6) for p0, p1 in probs]), np.int64)
    got = pm(feats)
    assert got.dtype == np.uint8 and got.shape == (256,)
    diff = np.abs(got.astype(np.int64) - host_ml)
    assert diff.max() <= 1 and (diff == 0).mean() > 0.9
    # fused megabatch + pipelined async path carry the same u8 epilogue
    arr = pm.collect(pm.dispatch_many_async([feats, feats]))
    assert arr.dtype == np.uint8 and arr.shape == (2, 256)
    np.testing.assert_array_equal(arr[0], got)
    pp.close()
    pm.close()


def test_call_mods_bam_u8_fetch_matches_probs_fetch(tmp_path):
    """call_mods --fetch_quant u8 end-to-end: output modbam ML bytes within
    1 of the exact probs-fetch run (same model, same reads), MM identical."""
    pytest.importorskip("torch")
    from tests.synth import make_synth_bam
    from tests.test_call_mods_e2e import _make_ckpt
    from ccsmeth_tpu.bamio import BamReader
    from ccsmeth_tpu.pipeline.call_mods import CallModsConfig, call_mods_bam

    bam = str(tmp_path / "in.bam")
    make_synth_bam(bam, n_reads=6, read_len=200, ref_len=2000, seed=13)
    _tm, ckpt = _make_ckpt(tmp_path)

    def tags(path):
        return {r.qname: (r.get_tag("MM") if r.has_tag("MM") else None,
                          np.asarray(r.get_tag("ML"), np.int64)
                          if r.has_tag("ML") else None)
                for r in BamReader(path)}

    base = CallModsConfig(model_file=ckpt, mode="denovo", batch_size=32)
    ref = tags(call_mods_bam(base, bam, str(tmp_path / "p")))
    cfg8 = dataclasses.replace(base, fetch_quant="u8")
    got = tags(call_mods_bam(cfg8, bam, str(tmp_path / "u")))
    assert set(got) == set(ref)
    n_ml = 0
    for q, (mm, ml) in got.items():
        mm_r, ml_r = ref[q]
        assert mm == mm_r
        if ml_r is not None:
            n_ml += len(ml_r)
            assert np.abs(ml - ml_r).max() <= 1
    assert n_ml > 0


def test_adaptive_put_gate_probes_and_picks_winner():
    """_AdaptivePutGate (r5): probes each stream limit on live puts, keeps
    the measured winner, preserves FIFO admission, and re-probes after the
    steady phase."""
    from ccsmeth_tpu.parallel.mesh import _AdaptivePutGate

    gate = _AdaptivePutGate(limits=(2, 1))
    t = [0.0]

    def put(duration, nbytes=1_000_000):
        tk = gate.ticket()
        gate.enter(tk)
        t0 = t[0]
        t[0] += duration
        gate.exit(t0, t[0], nbytes)

    put(0.1)  # warmup skip
    # probe limit=2: 3 puts at 0.1 s each (serialized fake clock -> 10 MB/s)
    for _ in range(3):
        put(0.1)
    assert gate._limit == 1  # moved on to probing limit=1
    for _ in range(3):
        put(0.05)  # 20 MB/s — limit=1 wins
    assert gate._limit == 1
    assert gate.history and gate.history[-1][0] == 1
    snap = gate.snapshot()
    assert snap["limit"] == 1 and snap["history"]
    # steady phase runs STEADY_N puts then re-probes the other limit
    for _ in range(_AdaptivePutGate.STEADY_N):
        put(0.05)
    assert gate._limit == 2  # loser probed first on re-probe
    # FIFO tickets: enter() order must match issue order even out-of-order
    import threading as th

    order = []
    tk1, tk2 = gate.ticket(), gate.ticket()

    def late():
        gate.enter(tk2)
        order.append(2)
        gate.exit(0.0, 0.01, 1)

    thr = th.Thread(target=late)
    thr.start()
    import time as _t

    _t.sleep(0.05)
    gate.enter(tk1)
    order.append(1)
    gate.exit(0.0, 0.01, 1)
    thr.join(5.0)
    assert order == [1, 2]
    # cancelled tickets (failed pack stage) must not strand FIFO admission
    tk3, tk4 = gate.ticket(), gate.ticket()
    gate.cancel(tk3)
    gate.enter(tk4)  # would deadlock if tk3 blocked admission
    gate.exit(0.0, 0.01, 1)


def test_pipelined_async_dispatch_propagates_pack_errors():
    """An exception in the host pack stage (malformed feats) must surface on
    the returned future, not kill the put thread silently — and the
    dispatcher must keep working for subsequent good groups."""
    import pytest

    cfg = AttRNNConfig(dropout_rate=0.0)
    params = init_attrnn(5, cfg)
    predict = make_predict_fn(_apply_for(cfg, "xla", "fp32"), params, cfg)
    bad = _feats(16)
    del bad["kmer"]  # pack stage will KeyError
    fut = predict.dispatch_many_async([bad, _feats(16)])
    with pytest.raises(KeyError):
        predict.collect(fut)
    good = [_feats(16, seed=3)] * 2
    ref = np.asarray(predict.collect(predict.dispatch_many(good)))
    got = np.asarray(predict.collect(predict.dispatch_many_async(good)))
    np.testing.assert_array_equal(got, ref)
    predict.close()
