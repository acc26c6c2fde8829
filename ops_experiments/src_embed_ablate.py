"""Sub-attribute the transenc/attrnn embed cost (r4 ablate follow-up): the
full-model ablation measured embed+concat at ~1.1 us/site — split it into
(a) the table gathers and (b) the src_embed conv->BN->ReLU->maxpool stack
(models/attrnn.py apply_src_embed, 3 conv layers ~35 MFLOP/site), and time
an im2col MATMUL formulation of the convs (same math: conv at L=21/K=3 is a
(N*L, K*Cin) @ (K*Cin, Cout) dense dot) at fp32 and bf16.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/src_embed_ablate.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("CCS_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ccsmeth_tpu.models.attrnn import _bn, _maxpool1d_same, apply_src_embed
from ccsmeth_tpu.models.config import TransEncConfig
from ccsmeth_tpu.models.transenc import init_transenc
from ccsmeth_tpu.utils.constants import MAX_PASSES


def conv1d_mm(x, w, cd=None):
    """im2col matmul conv1d, SAME pad, stride 1; exact same math as
    _conv1d_same up to fp accumulation order."""
    N, L, Cin = x.shape
    Cout, _, K = w.shape
    p = K // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    cols = jnp.concatenate([xp[:, i:i + L, :] for i in range(K)], axis=2)
    wm = jnp.transpose(w, (2, 1, 0)).reshape(K * Cin, Cout)
    if cd is not None:
        cols = cols.astype(cd)
        wm = wm.astype(cd)
    return jnp.dot(cols, wm, preferred_element_type=jnp.float32)


def src_embed_mm(params, x, cd=None):
    h = _maxpool1d_same(jax.nn.relu(_bn(conv1d_mm(x, params["conv1"], cd),
                                        params["bn1"])))
    h = _maxpool1d_same(jax.nn.relu(_bn(conv1d_mm(h, params["conv2"], cd),
                                        params["bn2"])))
    for blk in params["plus"]:
        h = _maxpool1d_same(jax.nn.relu(_bn(conv1d_mm(h, blk["conv"], cd),
                                            blk["bn"])))
    return h


def bench(fn, *args, B, iters=10):
    @jax.jit
    def loop(*args):
        def body(c, _):
            o = fn(args[0] * (1.0 + c * 1e-6), *args[1:])
            return jnp.asarray(o, jnp.float32).reshape(-1)[0], 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return B * iters / best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384  # strand-samples
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = TransEncConfig(dropout_rate=0.0)
    params = jax.device_put(init_transenc(3, cfg))
    rng = np.random.RandomState(0)
    L = cfg.seq_len
    kmer = jax.device_put(rng.randint(0, 5, (B, L)).astype(np.float32))
    kin = jax.device_put(rng.randint(0, 900, (B, L)).astype(np.float32))
    kin2 = jax.device_put(rng.randint(0, 900, (B, L)).astype(np.float32))
    kp = jax.device_put(np.full((B, L), 8.0, np.float32))
    # gathers only (the 4 table lookups + concat)
    def gathers(kmer, kin, kin2, kp):
        parts = [
            jnp.take(params["seq_embed"], kmer.astype(jnp.int32), axis=0),
            jnp.take(params["ipd_embed"], kin.astype(jnp.int32), axis=0),
            jnp.take(params["pw_embed"], kin2.astype(jnp.int32), axis=0),
            jnp.take(params["npass_embed"],
                     jnp.clip(kp, 1, MAX_PASSES).astype(jnp.int32), axis=0),
        ]
        return jnp.concatenate(parts, axis=2)

    r = bench(lambda k: jnp.sum(gathers(k, kin, kin2, kp), axis=(1, 2)),
              kmer, B=B, iters=iters)
    print("{:26s} {:9.0f} strand-samples/s  {:6.3f} us".format(
        "gathers+concat", r, 1e6 / r), flush=True)

    cat = np.asarray(jax.jit(gathers)(kmer, kin, kin2, kp))
    x = jax.device_put(cat)
    te = params["trans_input"]
    ref = np.asarray(jax.jit(lambda x: apply_src_embed(te, x))(x))
    for name, fn in (
            ("src_embed conv (shipped)", lambda x: apply_src_embed(te, x)),
            ("src_embed matmul fp32", lambda x: src_embed_mm(te, x)),
            ("src_embed matmul bf16",
             lambda x: src_embed_mm(te, x, jnp.bfloat16))):
        got = np.asarray(jax.jit(fn)(x))
        err = float(np.max(np.abs(got - ref)))
        r = bench(lambda xx, f=fn: jnp.sum(f(xx), axis=(1, 2)), x,
                  B=B, iters=iters)
        print("{:26s} {:9.0f} strand-samples/s  {:6.3f} us  maxdiff {:.2e}"
              .format(name, r, 1e6 / r, err), flush=True)


if __name__ == "__main__":
    main()
