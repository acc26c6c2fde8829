"""Multi-host primitives on the virtual 8-device CPU mesh: the psum frequency
merge must reproduce the single-host frequency table exactly."""

import jax
import numpy as np

from ccsmeth_tpu.parallel.distributed import (
    merge_region_accumulators,
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


def test_psum_site_counts_equals_serial():
    assert jax.device_count() == 8
    mesh = data_mesh()
    rng = np.random.RandomState(0)
    n_sites = 1000
    # each "host" (device shard) owns a disjoint site range and zeros elsewhere
    full = rng.randint(0, 30, size=(n_sites, 2)).astype(np.float32)
    n_dev = 8
    local = np.zeros_like(full)
    # simulate: device d owns sites where site_idx % 8 == d; since psum sums over
    # the sharded axis, feed a table where each shard-row-block holds only its
    # owned contributions
    per_dev = np.zeros((n_dev, n_sites, 2), np.float32)
    for s in range(n_sites):
        per_dev[s % n_dev, s] = full[s]
    stacked = per_dev.reshape(n_dev * n_sites, 2)
    merged = psum_site_counts(stacked, mesh)
    # every shard's output block is the global sum
    out_blocks = merged.reshape(n_dev, n_sites, 2)
    for d in range(n_dev):
        np.testing.assert_array_equal(out_blocks[d], full)


def test_merge_region_accumulators():
    t1 = {10: [(0.9, 1)], 20: [(0.1, 0)]}
    t2 = {30: [(0.5, 2)], 20: [(0.7, 1)]}
    merged = merge_region_accumulators([t1, t2])
    assert merged[10] == [(0.9, 1)]
    assert merged[20] == [(0.1, 0), (0.7, 1)]
    assert merged[30] == [(0.5, 2)]
