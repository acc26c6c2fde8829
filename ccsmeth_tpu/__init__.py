"""ccsmeth_tpu: a TPU-native (JAX/XLA/Pallas) PacBio CCS 5mCpG methylation engine.

Capability-equivalent to PengNi/ccsmeth v0.5.0 (reference at /root/reference), built
from scratch TPU-first:

- feature extraction is vectorized numpy producing fixed-shape device-ready tensors
  (no per-site Python loops, no string TSV detour on the hot path),
- the call_mods BiGRU+attention model and the call_freqb aggregate model are pure
  JAX functions over a params pytree, with the GRU recurrence available both as a
  ``jax.lax.scan`` and as a fused Pallas TPU kernel,
- BAM I/O is an in-repo BGZF/BAM codec (this environment has no pysam/htslib),
- scaling is data-parallel sharding over a ``jax.sharding.Mesh`` with psum/all_gather
  collectives (replacing the reference's NCCL DDP + multiprocessing queues).
"""

from ._version import __version__

__all__ = ["__version__"]
