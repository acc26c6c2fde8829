"""Device-mesh data parallelism.

The reference scales with share-nothing CPU processes + NCCL DDP
(/root/reference/ccsmeth/train_multigpu.py:86-94, call_modifications.py:465-471).
Here a single ``jax.sharding.Mesh`` over all chips (one axis: 'data') covers
single-chip, single-host-multichip, and multi-host uniformly: batches are sharded on
'data', params replicated, XLA inserts the collectives (psum for gradients/metric
reductions) over ICI/DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_predict_fn(apply_fn, params, cfg, mesh: Mesh | None = None):
    """Build a jitted data-parallel predict step: feats dict -> softmax probs (B, C).

    Works on one device (trivial mesh) or many; batch dim must divide the mesh size
    (callers pad to a fixed batch). Params are replicated once up front.
    """
    if mesh is None:
        mesh = data_mesh()
    batch_sharding = shard_batch_spec(mesh)
    rep = replicated_spec(mesh)
    params = jax.device_put(params, rep)

    @jax.jit
    def _predict(feats):
        _logits, probs = apply_fn(params, cfg, feats)
        return probs

    def predict(feats: dict) -> np.ndarray:
        feats = {k: jax.device_put(v, batch_sharding) for k, v in feats.items()}
        return np.asarray(_predict(feats))

    return predict
