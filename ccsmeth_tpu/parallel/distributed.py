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

    Multi-process-correct by construction: the global (world*n, k) array is
    assembled with jax.make_array_from_process_local_data — each process
    supplies only its addressable shards (its partial in the first local-device
    shard, zeros in the rest), the same pattern as the training loop's global
    batch assembly (training/train.py to_global) — then one psum over the
    'data' mesh axis reconstitutes the summed table on every shard.
    """
    if mesh is None:
        from .mesh import data_mesh

        mesh = data_mesh()
    local_counts = np.ascontiguousarray(local_counts, np.float32)
    world = mesh.devices.size
    if world == 1:
        return local_counts
    n, k = local_counts.shape
    n_local = world // max(jax.process_count(), 1)
    local_block = np.zeros((n_local * n, k), np.float32)
    local_block[:n] = local_counts
    sharding = NamedSharding(mesh, P("data"))
    global_arr = jax.make_array_from_process_local_data(sharding, local_block,
                                                        (world * n, k))
    merged = _psum_merge_fn(mesh)(global_arr)
    return np.asarray(merged.addressable_shards[0].data)
