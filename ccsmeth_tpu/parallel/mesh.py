"""Device-mesh data parallelism.

The reference scales with share-nothing CPU processes + NCCL DDP
(/root/reference/ccsmeth/train_multigpu.py:86-94, call_modifications.py:465-471).
Here a single ``jax.sharding.Mesh`` over all chips (one axis: 'data') covers
single-chip, single-host-multichip, and multi-host uniformly: batches are sharded on
'data', params replicated, XLA inserts the collectives (psum for gradients/metric
reductions) over ICI/DCN.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class _AdaptivePutGate:
    """Admission control for megabatch device_puts: pick 1 vs 2 concurrent
    put streams by MEASURING the achieved aggregate wire rate on the real
    put stream, with periodic re-probes.

    Why adaptive (r5, VERDICT r4 next #1): through the remote tunnel the win
    flips with the window. The r4 driver window multiplexed RPCs — 2-stream
    mega-puts measured 46.4 MB/s vs 19.4 serial (2.4x) — while the r5a
    window serialized them — 2-stream 29.3 vs 36.0 serial (0.81x). A static
    stream count is wrong in one of the two regimes, so the gate probes both
    on live traffic: PROBE_N puts at each limit, keep the faster (with
    hysteresis), re-probe the loser every STEADY_N puts. On PCIe-local hosts
    puts are µs-scale and the gate never matters.

    Admission is strictly FIFO (tickets issued at submit time): put k+1 may
    only enter after put k has entered, so megabatch order on the wire is
    preserved at either limit."""

    PROBE_N = 3
    STEADY_N = 96
    HYSTERESIS = 1.05  # switch only on a >5% measured win

    def __init__(self, limits=(2, 1)):
        self._cv = threading.Condition()
        self._limits = limits
        self._limit = limits[0]
        self._active = 0
        self._next_ticket = 0
        self._admit = 0
        self._cancelled: set[int] = set()
        # measurement state (guarded by _cv's lock)
        self._recs: list[tuple[float, float, int]] = []  # (t0, t1, nbytes)
        self._skipped_warmup = False
        self._steady_left = 0
        self._rates = {}  # limit -> last measured MB/s
        self.history: list[tuple[int, float]] = []  # (limit, MB/s) decided

    def ticket(self) -> int:
        with self._cv:
            t = self._next_ticket
            self._next_ticket += 1
            return t

    def enter(self, t: int):
        with self._cv:
            while self._active >= self._limit or t != self._admit:
                self._cv.wait()
            self._admit += 1
            self._advance_admit()
            self._active += 1

    def cancel(self, t: int):
        """Abandon a ticket whose put will never run (pack-stage failure) so
        FIFO admission never waits on it."""
        with self._cv:
            self._cancelled.add(t)
            self._advance_admit()
            self._cv.notify_all()

    def _advance_admit(self):
        while self._admit in self._cancelled:
            self._cancelled.discard(self._admit)
            self._admit += 1

    def exit(self, t0: float, t1: float, nbytes: int):
        with self._cv:
            self._active -= 1
            if not self._skipped_warmup:
                # first put eats transfer-path first-touch cost — not signal
                self._skipped_warmup = True
            else:
                self._recs.append((t0, t1, nbytes))
                self._maybe_transition()
            self._cv.notify_all()

    def _rate(self) -> float:
        span = max(r[1] for r in self._recs) - min(r[0] for r in self._recs)
        return sum(r[2] for r in self._recs) / 1e6 / max(span, 1e-9)

    def _maybe_transition(self):
        if self._steady_left > 0:  # steady phase
            self._steady_left -= 1
            if self._steady_left == 0:  # re-probe BOTH limits (loser first —
                # the window may have drifted since the last decision)
                other = [l for l in self._limits if l != self._limit][0]
                self._limit = other
                self._rates = {}
                self._recs = []
            return
        if len(self._recs) < self.PROBE_N:
            return
        # probe phase for self._limit complete
        self._rates[self._limit] = self._rate()
        self._recs = []
        untried = [l for l in self._limits if l not in self._rates]
        if untried:
            self._limit = untried[0]
            return
        # all limits measured: keep the winner (hysteresis favors current)
        best = max(self._rates, key=lambda l: self._rates[l])
        if (best != self._limit
                and self._rates[best] < self._rates[self._limit] * self.HYSTERESIS):
            best = self._limit
        self._limit = best
        self.history.append((best, round(self._rates[best], 1)))
        self._steady_left = self.STEADY_N

    def snapshot(self) -> dict:
        with self._cv:
            return {"limit": self._limit,
                    "history": list(self.history[-8:])}


def data_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_predict_fn(apply_fn, params, cfg, mesh: Mesh | None = None,
                    transfer_dtype=np.float32, dispatch_workers: int = 2,
                    kinetics_quant: str = "none", put_streams: int = 3,
                    fetch_mode: str = "probs"):
    """Build a jitted data-parallel predict step: feats dict -> softmax probs (B, C).

    Works on one device (trivial mesh) or many; batch dim must divide the mesh size
    (callers pad to a fixed batch). Params are replicated once up front.

    Host->device traffic is minimized: only the ACTIVE feature channels transfer
    (kmer as int8, per-read npass as one scalar per site); disabled channels
    (stds/sn/map when the model config has them off — the production default) are
    synthesized as zeros ON DEVICE inside the jit. The returned callable also
    exposes ``.dispatch(feats)`` -> device future and ``.collect(fut)`` so callers
    can pipeline transfers against compute, plus ``.dispatch_async(feats)`` which
    issues the pack+device_put from a small thread pool (``dispatch_workers``):
    through a remote-attached device every put is a fixed-latency RPC, and
    overlapping 2 in-flight puts measured 2.2x streaming throughput (bench.py e2e
    ``threaded`` probe); on local-PCIe hardware it simply overlaps host packing
    with compute. Results stay correctly paired because each future carries its
    own output array.
    """
    if mesh is None:
        mesh = data_mesh()
    batch_sharding = shard_batch_spec(mesh)
    rep = replicated_spec(mesh)
    params = jax.device_put(params, rep)
    L = cfg.seq_len
    need_stds = getattr(cfg, "is_stds", False)
    need_sn = getattr(cfg, "is_sn", False)
    need_map = getattr(cfg, "is_map", False)
    # optional int8 kinetics transfer: standardized (zscore/mad) IPD/PW means
    # quantize to round(x*16) clipped to int8 (±7.94 range, 1/16 granularity)
    # and dequantize on device — 218 -> 134 bytes/site, for wire-bandwidth-
    # constrained host<->device links. Opt-in: probs may drift a few ML bytes.
    if kinetics_quant not in ("none", "int8"):
        raise ValueError("kinetics_quant must be 'none' or 'int8'")
    quant = kinetics_quant == "int8"
    from ..utils.wirefmt import (
        dequant_i8_jx,
        pack_kmer4_np,
        pack_u16_np,
        quant_i8_np,
        unpack_kmer4_jx,
        unpack_u16_jx,
    )

    kin_dtype = np.int8 if quant else transfer_dtype
    # fast path only (bf16/int8 transfer): fetch probs as bf16 — halves the
    # per-dispatch result RPC (the (k, B, 2) fp32 fetch is ~10% of a
    # megabatch's compute time through the tunnel). Relative error ≤0.4%,
    # within the fast path's documented ~1 ML-byte drift; the fp32 parity
    # path keeps fp32 results bit-exact.
    fetch_bf16 = quant or np.dtype(transfer_dtype).itemsize == 2
    # fetch_mode='mlbyte': the modbam path only consumes floor(p1n*256) ML
    # bytes (utils/codecs.convert_probs_to_mltag, _bam2modbam.py:206-208), so
    # the jit epilogue normalizes + quantizes on device and the result RPC
    # ships ONE uint8 per site instead of two bf16 probs (4 -> 1 B/site; the
    # streamed fused path is wire-bound, PERF.md §3). Equal to the host
    # computation except when p1n sits within ~5e-7 of a multiple of 1/256
    # (the host rounds to 6 decimals first) — inside the fast path's
    # documented ≤1-ML-byte envelope. The TSV path (6-decimal prob prints)
    # keeps fetch_mode='probs'.
    if fetch_mode not in ("probs", "mlbyte"):
        raise ValueError("fetch_mode must be 'probs' or 'mlbyte'")
    fetch_mlbyte = fetch_mode == "mlbyte"

    def _fetch_cast(probs):
        if fetch_mlbyte:
            p = probs.astype(jnp.float32)
            p1n = p[..., 1] / (p[..., 0] + p[..., 1])
            return jnp.clip(jnp.floor(p1n * 256.0), 0, 255).astype(jnp.uint8)
        return probs.astype(jnp.bfloat16) if fetch_bf16 else probs

    def _dequant(v):
        return dequant_i8_jx(v) if quant else v.astype(jnp.float32)

    def _predict_impl(compact):
        B = compact["kmer"].shape[0]
        # optional explicit RNN initial states (call_mods --h0_mode randn):
        # transferred batch-major (B, nl2, H) so the data sharding lands on the
        # batch dim, restored to apply_attrnn's (nl2, B, H) here; key presence
        # is static per trace
        h0s = {k: jnp.transpose(compact[k], (1, 0, 2))
               for k in ("h0", "h0_2", "c0", "c0_2") if k in compact}
        feats = {}
        for s in ("", "2"):
            feats["kmer" + s] = compact["kmer" + s].astype(jnp.float32)
            feats["kpass" + s] = jnp.broadcast_to(
                compact["kpass" + s][:, None].astype(jnp.float32), (B, L))
            feats["ipd_means" + s] = _dequant(compact["ipd_means" + s])
            feats["pw_means" + s] = _dequant(compact["pw_means" + s])
            feats["ipd_stds" + s] = (compact["ipd_stds" + s].astype(jnp.float32)
                                     if need_stds else jnp.zeros((B, L)))
            feats["pw_stds" + s] = (compact["pw_stds" + s].astype(jnp.float32)
                                    if need_stds else jnp.zeros((B, L)))
            feats["sns" + s] = (compact["sns" + s].astype(jnp.float32)
                                if need_sn else jnp.zeros((B, 4)))
            feats["maps" + s] = (compact["maps" + s].astype(jnp.float32)
                                 if need_map else jnp.zeros((B, L)))
        _logits, probs = apply_fn(params, cfg, feats, **h0s)
        return probs

    _predict = jax.jit(lambda compact: _fetch_cast(_predict_impl(compact)))

    def _compact(feats: dict) -> dict:
        out = {}
        B = np.asarray(feats["kmer"]).shape[0]

        def opt(key, shape):
            v = feats.get(key)
            return (np.zeros(shape, np.float32) if v is None
                    else np.asarray(v, np.float32))

        def kin(arr):
            if quant:
                return quant_i8_np(arr)
            return np.asarray(arr, transfer_dtype)

        for s in ("", "2"):
            out["kmer" + s] = np.asarray(feats["kmer" + s], np.int8)
            kp = np.asarray(feats["kpass" + s])
            out["kpass" + s] = (kp[:, 0] if kp.ndim == 2 else kp).astype(np.float32)
            out["ipd_means" + s] = kin(feats["ipd_means" + s])
            out["pw_means" + s] = kin(feats["pw_means" + s])
            if need_stds:
                out["ipd_stds" + s] = opt("ipd_stds" + s, (B, L))
                out["pw_stds" + s] = opt("pw_stds" + s, (B, L))
            if need_sn:
                out["sns" + s] = opt("sns" + s, (B, 4))
            if need_map:
                out["maps" + s] = opt("maps" + s, (B, L))
        for k in ("h0", "h0_2", "c0", "c0_2"):  # (nl2, B, H) -> (B, nl2, H)
            if k in feats:
                out[k] = np.ascontiguousarray(
                    np.moveaxis(np.asarray(feats[k], np.float32), 1, 0))
        return out

    # --- packed transfer: ONE device_put per batch -------------------------
    # Through a remote-attached device (the axon tunnel) every device_put is
    # an RPC with fixed latency, so the ~9 per-channel puts dominate the
    # streaming pipeline (measured: 67k sites/s e2e vs 461k forward-only).
    # Pack all channels of one site into a contiguous byte row -> a single
    # (B, row_bytes) uint8 put that still shards on 'data'; the jit unpacks
    # with static column slices + bitcasts/bit-ops (exact, on-device).
    #
    # Wire kinds (the streamed fused path is wire-bandwidth-bound, so every
    # byte of the row counts — PERF.md §3):
    #   raw   — channel bytes as-is (dtype per field)
    #   kmer4 — two 4-bit base codes per byte (codes are 0..4, utils/constants
    #           BYTE2CODE — EXACT; 21 B -> 11 B per strand)
    #   u16   — round+clip to uint16. Quant path only: npass is an integer BAM
    #           tag (features/extract.py:190-191) so this is exact in
    #           production; the no-quant path keeps fp32 so synthetic
    #           fractional kpass stays bit-identical.
    _KM4 = (L + 1) // 2
    kin_dtype = np.dtype(kin_dtype)
    _fields = [("kmer", "kmer4", np.dtype(np.uint8), _KM4),
               ("kpass", "u16" if quant else "raw",
                np.dtype(np.uint16 if quant else np.float32),
                2 if quant else 4),
               ("ipd_means", "raw", kin_dtype, kin_dtype.itemsize * L),
               ("pw_means", "raw", kin_dtype, kin_dtype.itemsize * L)]
    if need_stds:
        _fields += [("ipd_stds", "raw", np.dtype(np.float32), 4 * L),
                    ("pw_stds", "raw", np.dtype(np.float32), 4 * L)]
    if need_sn:
        _fields += [("sns", "raw", np.dtype(np.float32), 16)]
    if need_map:
        _fields += [("maps", "raw", np.dtype(np.float32), 4 * L)]
    _fields = [(k + s, kind, dt, nb)
               for s in ("", "2") for k, kind, dt, nb in _fields]
    _offsets, _row_bytes = {}, 0
    for k, _kind, _dt, nb in _fields:
        _offsets[k] = _row_bytes
        _row_bytes += nb

    def _pack(compact: dict) -> np.ndarray:
        B = compact["kmer"].shape[0]
        buf = np.empty((B, _row_bytes), np.uint8)
        for k, kind, dt, nb in _fields:
            o = _offsets[k]
            if kind == "kmer4":
                buf[:, o:o + nb] = pack_kmer4_np(compact[k])
            elif kind == "u16":
                buf[:, o:o + nb] = pack_u16_np(compact[k])
            else:
                v = np.ascontiguousarray(compact[k].astype(dt, copy=False))
                buf[:, o:o + nb] = v.view(np.uint8).reshape(B, -1)
        return buf

    def _unpack(buf):
        B = buf.shape[0]
        out = {}
        for k, kind, dt, nb in _fields:
            o = _offsets[k]
            raw = buf[:, o:o + nb]
            if kind == "kmer4":
                out[k] = unpack_kmer4_jx(raw, L).astype(jnp.int8)
            elif kind == "u16":
                out[k] = unpack_u16_jx(raw)[:, 0]
            elif dt.itemsize == 1:
                out[k] = jax.lax.bitcast_convert_type(raw, jnp.int8)
            else:
                n = nb // dt.itemsize
                v = jax.lax.bitcast_convert_type(
                    raw.reshape(B, n, dt.itemsize), jnp.dtype(dt))
                out[k] = v[:, 0] if n == 1 else v
        return out

    def _predict_packed_impl(packed):
        compact = dict(_unpack(packed["buf"]))
        for k in ("h0", "h0_2", "c0", "c0_2"):
            if k in packed:
                compact[k] = packed[k]
        return _predict_impl(compact)

    _predict_packed = jax.jit(
        lambda packed: _fetch_cast(_predict_packed_impl(packed)))

    # --- megabatch: ONE dispatch + ONE fetch per k logical batches ----------
    # Even with packed single-put transfers, every batch still costs one
    # dispatch RPC and one result-fetch RPC; through the tunnel those fixed
    # latencies bound streaming at ~1/3 of the forward ceiling (bench.py e2e
    # `resident_sites_per_s`). Stacking k packed batches into a (k, B, row)
    # buffer and lax.scan-ning the SAME per-batch step over k on-device keeps
    # the compiled kernel shapes identical while dividing every per-call RPC
    # (put, dispatch, fetch) by k. Results come back as one (k, B, C) array.
    mega_sharding = NamedSharding(mesh, P(None, "data"))

    @jax.jit
    def _predict_mega(mega):
        def body(c, per):
            return c, _predict_packed_impl(per)

        _, probs = jax.lax.scan(body, jnp.int32(0), mega)
        return _fetch_cast(probs)

    def _pack_group(feats_list) -> dict:
        """Host-side stage: compact + pack k batches into one (k, B, row)
        megabatch dict. Pure numpy — no device traffic."""
        packs = []
        for f in feats_list:
            compact = _compact(f)
            p = {"buf": _pack(compact)}
            for k in ("h0", "h0_2", "c0", "c0_2"):
                if k in compact:
                    p[k] = compact[k]
            packs.append(p)
        return {k: np.stack([p[k] for p in packs]) for k in packs[0]}

    def _stage_and_step(mega: dict, gate_ticket: int | None = None):
        """Wire stage: ONE device_put of the megabatch + enqueue the fused
        step. Runs on the put pool; when the adaptive gate is active the put
        is admitted FIFO at the gate's current stream limit and its wall
        time feeds the limit controller (block_until_ready only delays the
        compute ENQUEUE to when the data has arrived — which is when compute
        could first run anyway)."""
        if _put_gate is None or gate_ticket is None:
            staged = {k: jax.device_put(v, mega_sharding)
                      for k, v in mega.items()}
            return _predict_mega(staged)
        _put_gate.enter(gate_ticket)
        t0 = time.perf_counter()
        out = None
        try:
            staged = {k: jax.device_put(v, mega_sharding)
                      for k, v in mega.items()}
            # enqueue compute BEFORE blocking on the transfer: the dispatch
            # RPC (~12 ms) rides the wire concurrently with the put's tail
            # instead of serializing after it; the block below only paces the
            # gate + feeds its rate measurement
            out = _predict_mega(staged)
            jax.block_until_ready(staged)
        finally:
            _put_gate.exit(t0, time.perf_counter(),
                           sum(v.nbytes for v in mega.values()))
        return out

    def dispatch_many(feats_list):
        """Fuse k same-shape batches into one device call; returns a device
        array future of shape (k, B, C). All batches must be padded to the
        same fixed batch size (callers already pad to pad_n)."""
        return _stage_and_step(_pack_group(feats_list))

    def _fetch_np(dev_arr) -> np.ndarray:
        """Blocking device->host fetch + dtype normalization (runs on the
        fetch thread so the RPC overlaps the next megabatch's compute)."""
        arr = np.asarray(dev_arr)
        if arr.dtype == np.uint8 or arr.dtype == np.float32:
            return arr
        # bf16 wire results surface as float32 to callers (6-decimal
        # per_readsite prints, ML-byte rounding)
        return arr.astype(np.float32)

    def dispatch_many_async(feats_list):
        """Three-stage pipelined fused dispatch (VERDICT r3 next #3, r4 next
        #1/#2): host packing runs on the pack pool, the device_put + dispatch
        on a ``put_streams``-wide put pool, and the result fetch on a
        dedicated fetch thread chained per-future.

        - adaptive put streams (_AdaptivePutGate): the win flips with the
          window — 2-stream mega-puts measured 2.4x serial in the r4 driver
          window (multiplexing) but 0.81x in the r5a window (serializing) —
          so the gate probes both limits on live traffic and keeps the
          faster, re-probing periodically.
        - chained fetch: megabatch k's result RPC (~17 ms/193 ms period,
          PERF.md §3) runs on the fetch thread while megabatch k+1 computes,
          so collect() returns an already-fetched host array and the caller's
          loop never blocks on the wire."""
        if _pool is None:
            return dispatch_many(feats_list)
        tkt = _put_gate.ticket() if _put_gate is not None else None

        def _gated_put():
            try:
                mega = pack_fut.result()
            except BaseException:
                if _put_gate is not None:  # never strand FIFO admission on
                    _put_gate.cancel(tkt)  # a failed pack
                raise
            return _stage_and_step(mega, tkt)

        pack_fut = _pool.submit(_pack_group, feats_list)
        put_fut = _put_pool.submit(_gated_put)
        return _fetch_pool.submit(lambda: _fetch_np(put_fut.result()))

    def dispatch(feats: dict):
        compact = _compact(feats)
        packed = {"buf": _pack(compact)}
        for k in ("h0", "h0_2", "c0", "c0_2"):
            if k in compact:
                packed[k] = compact[k]
        staged = {k: jax.device_put(v, batch_sharding)
                  for k, v in packed.items()}
        return _predict_packed(staged)

    def dispatch_unpacked(feats: dict):
        compact = {k: jax.device_put(v, batch_sharding)
                   for k, v in _compact(feats).items()}
        return _predict(compact)

    _pool = (ThreadPoolExecutor(max_workers=dispatch_workers,
                                thread_name_prefix="ccs-dispatch")
             if dispatch_workers > 0 else None)
    # put stage: up to `put_streams` concurrent megabatch device_puts behind
    # the ADAPTIVE gate — measured per-window, concurrency wins 2.4x on
    # multiplexing tunnels (r4 driver capture: 46.4 vs 19.4 MB/s) and loses
    # ~20% on serializing ones (r5a capture: 29.3 vs 36.0 MB/s), so the gate
    # probes both stream limits on live traffic and keeps the faster.
    # put_streams=1 restores the strict single-FIFO behavior (no gate).
    _put_pool = (ThreadPoolExecutor(max_workers=max(1, put_streams),
                                    thread_name_prefix="ccs-put")
                 if dispatch_workers > 0 else None)
    # probe order: 2 streams (the common multiplexing win), then 1 (strictly
    # serializing windows), then deeper if allowed (the r4 driver window
    # measured 2 streams at 2.4x serial — superlinear, so 3 may extract more)
    _gate_limits = (2, 1) + tuple(range(3, put_streams + 1))
    _put_gate = (_AdaptivePutGate(limits=_gate_limits)
                 if dispatch_workers > 0 and put_streams > 1 else None)
    # fetch stage: one thread resolves result RPCs in dispatch order so the
    # consumer's collect() never blocks on device compute + wire
    _fetch_pool = (ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="ccs-fetch")
                   if dispatch_workers > 0 else None)

    def dispatch_async(feats: dict):
        """Like dispatch() but returns a concurrent Future; pack + device_put
        (the RPC-latency-bound part) runs on a pool thread so up to
        ``dispatch_workers`` transfers overlap. collect() resolves either kind."""
        if _pool is None:
            return dispatch(feats)
        return _pool.submit(dispatch, feats)

    def collect(fut) -> np.ndarray:
        if isinstance(fut, Future):
            fut = fut.result()
        if isinstance(fut, np.ndarray):  # already fetched (fetch-thread chain)
            return fut
        return _fetch_np(fut)

    def predict(feats: dict) -> np.ndarray:
        return collect(dispatch(feats))

    predict.dispatch = dispatch
    predict.dispatch_async = dispatch_async
    predict.dispatch_unpacked = dispatch_unpacked
    predict.dispatch_many = dispatch_many
    predict.dispatch_many_async = dispatch_many_async
    predict.collect = collect

    def _close():
        for p in (_pool, _put_pool, _fetch_pool):
            if p is not None:
                p.shutdown()

    predict.close = _close
    predict.fetch_mode = fetch_mode
    predict.put_gate = _put_gate
    # internals for benchmarking/attribution (bench.py): stage inputs on device
    # once, then drive the jitted step directly (no per-call host->device copy)
    predict.compact = _compact
    predict.pack = _pack
    predict.row_bytes = _row_bytes
    predict.step = _predict
    predict.step_packed = _predict_packed
    predict.step_many = _predict_mega
    predict.batch_sharding = batch_sharding
    predict.mega_sharding = mega_sharding
    return predict
