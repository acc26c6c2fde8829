"""Multi-host primitives on the virtual 8-device CPU mesh. psum_site_counts is
collective per-PROCESS API — its true 2-process merge semantics are gated by
tests/test_call_freq_dist.py; here we check the single-process plumbing (the
partial must round-trip unchanged: the other device shards carry zeros)."""

import jax
import numpy as np

from ccsmeth_tpu.parallel.distributed import (
    owns_read,
    partition_chunks,
    psum_site_counts,
)
from ccsmeth_tpu.parallel.mesh import data_mesh


def test_partition_disjoint_and_complete():
    chunks = [("c1", i * 100, (i + 1) * 100) for i in range(17)]
    parts = [partition_chunks(chunks, p, 4) for p in range(4)]
    flat = [c for part in parts for c in part]
    assert sorted(flat) == sorted(chunks)
    for a in range(4):
        for b in range(a + 1, 4):
            assert not set(parts[a]) & set(parts[b])


def test_owns_read_partitioning():
    reads = ["m0/{}/ccs".format(i) for i in range(200)]
    owners = [[r for r in reads if owns_read(r, p, 3)] for p in range(3)]
    assert sum(len(o) for o in owners) == 200
    assert all(len(o) > 30 for o in owners)


def test_psum_site_counts_single_process_roundtrip():
    assert jax.device_count() == 8
    mesh = data_mesh()
    rng = np.random.RandomState(0)
    partial = rng.randint(0, 30, size=(1000, 2)).astype(np.float32)
    merged = psum_site_counts(partial, mesh)
    assert merged.shape == partial.shape
    np.testing.assert_array_equal(merged, partial)
    # odd row counts must not require divisibility by the device count
    partial3 = rng.randint(0, 9, size=(17, 5)).astype(np.float32)
    np.testing.assert_array_equal(psum_site_counts(partial3, mesh), partial3)
