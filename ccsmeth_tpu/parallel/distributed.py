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

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
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


@functools.lru_cache(maxsize=4)
def _psum_merge_fn(mesh: Mesh):
    @jax.jit
    def merge(x):
        return shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                         in_specs=P("data"), out_specs=P("data"))(x)

    return merge


def psum_site_counts(local_counts: np.ndarray, mesh: Mesh | None = None
                     ) -> np.ndarray:
    """All-reduce one per-PROCESS partial per-site count table over the mesh.

    COLLECTIVE: every process calls this with its own (n_sites, k) float32
    partial table (aligned on a shared site index, zeros at sites it did not
    see); returns the (n_sites, k) global SUM, identical on every process.
    This is the TPU replacement for the reference's share-nothing frequency
    workers (/root/reference/ccsmeth/call_mods_freq_bam.py:597-677) and for
    `reduce_mean` (train_multigpu.py:46-50), riding ICI/DCN instead of NCCL.

    Multi-process-correct by construction: the merge runs over a ONE-DEVICE-
    PER-PROCESS sub-mesh (there is one partial table per process, not per
    device), so each process's table IS its shard — no zero-padding by the
    local device count. The global (n_proc*n, k) array is assembled with
    jax.make_array_from_process_local_data (the same pattern as the training
    loop's global batch assembly, training/train.py to_global), then one psum
    over the 'data' mesh axis reconstitutes the summed table on every shard.
    """
    if mesh is None:
        from .mesh import data_mesh

        mesh = data_mesh()
    local_counts = np.ascontiguousarray(local_counts, np.float32)
    mmesh = _merge_mesh_from(mesh)
    world = mmesh.devices.size  # == number of participating processes
    if world == 1:
        return local_counts
    n, k = local_counts.shape
    sharding = NamedSharding(mmesh, P("data"))
    global_arr = jax.make_array_from_process_local_data(sharding, local_counts,
                                                        (world * n, k))
    merged = _psum_merge_fn(mmesh)(global_arr)
    return np.asarray(merged.addressable_shards[0].data)


@functools.lru_cache(maxsize=4)
def _merge_mesh_cached(mesh: Mesh) -> Mesh:
    by_proc: dict = {}
    for d in mesh.devices.flat:
        by_proc.setdefault(d.process_index, d)
    devs = [by_proc[p] for p in sorted(by_proc)]
    return Mesh(np.asarray(devs), ("data",))


def _merge_mesh_from(mesh: Mesh) -> Mesh:
    """One device per participating process, in process order — the natural
    mesh for merging per-PROCESS partial tables."""
    return _merge_mesh_cached(mesh)
