"""Multi-host scale-out: read-shard partitioning + collective frequency merge.

The reference's only distributed backend is NCCL DDP for training
(train_multigpu.py:86-94); inference scales by share-nothing processes. Here the
BASELINE.json north star is explicit: shard read batches across hosts and merge
per-site modification counts with XLA collectives before bedMethyl emission.

Design (SURVEY.md §5.7/§5.8):
 - every host scans its disjoint slice of the genome's chunk list
   (`partition_chunks`) or of the read stream (`owns_read`), producing per-site
   accumulators for sites it OWNS — ownership is disjoint by construction, so the
   merge is order-independent;
 - dense per-chunk count tensors [n_positions, 2] (count_mod, coverage) are merged
   with a single psum over the 'data' mesh axis (`psum_site_counts`) — ICI within
   a slice, DCN across slices, no NCCL analog needed.

jax.distributed.initialize() bootstraps the multi-host runtime
(`init_multihost`); single-process meshes run the identical code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def init_multihost(coordinator: str | None = None, num_processes: int = 1,
                   process_id: int = 0) -> None:
    """jax.distributed bootstrap (replaces the reference's NCCL TCP rendezvous,
    train_multigpu.py:89-94)."""
    if coordinator and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def partition_chunks(ref_chunks: list, process_id: int, num_processes: int) -> list:
    """Disjoint round-robin ownership of genome chunks across hosts."""
    return [c for i, c in enumerate(ref_chunks) if i % num_processes == process_id]


def owns_read(qname: str, process_id: int, num_processes: int) -> bool:
    """Stable hash-based read ownership for denovo-mode sharding."""
    import zlib

    return zlib.crc32(qname.encode()) % num_processes == process_id


def psum_site_counts(local_counts: np.ndarray, mesh: Mesh | None = None
                     ) -> np.ndarray:
    """All-reduce dense per-site count tensors over the 'data' mesh axis.

    local_counts: (n_sites, k) float32 — each device/host contributes the counts
    of sites it owns and ZEROS elsewhere; the psum reconstitutes the global table
    identically on every host.
    """
    if mesh is None:
        from .mesh import data_mesh

        mesh = data_mesh()
    if mesh.devices.size == 1:
        return np.asarray(local_counts)

    @jax.jit
    def merge(x):
        return shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                         in_specs=P("data"), out_specs=P("data"))(x)

    n = local_counts.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        local_counts = np.pad(local_counts, ((0, pad), (0, 0)))
    out = np.asarray(merge(jnp.asarray(local_counts)))
    return out[:n]


def merge_region_accumulators(per_host_tables: list[dict]) -> dict:
    """Host-side merge of disjoint {refpos: [(prob, hap)]} tables (used when
    accumulators travel as python objects rather than dense tensors). Ownership
    disjointness makes this a plain union; overlapping keys concatenate, keeping
    determinism because region assignment is disjoint by construction."""
    out: dict = {}
    for table in per_host_tables:
        for pos, vals in table.items():
            out.setdefault(pos, []).extend(vals)
    return out
