"""Columnar site-feature batches feeding the jitted model step.

Replaces the reference's per-site Python list-of-lists batching
(/root/reference/ccsmeth/call_modifications.py:73-123, ``_batch_feature_list2s``)
with concatenated fixed-shape numpy arrays plus a read-index column, so MM-tag
assembly can group predictions back per read without string sampleinfo rows.

Batches can be padded to a fixed size (``pad_to``) so ``jit`` never recompiles on
ragged tails — padded rows are masked out downstream.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .extract import ReadFeatures


@dataclasses.dataclass
class FeatureBatch:
    # per-site metadata
    read_idx: np.ndarray  # (N,) index into the source read list
    locs: np.ndarray  # (N,) read-coordinate mod-base location
    chrom_pos: np.ndarray  # (N,) ref coordinate or -1
    # model inputs, all (N, L) float32 unless noted
    kmer: np.ndarray
    kpass: np.ndarray
    ipd_means: np.ndarray
    pw_means: np.ndarray
    kmer2: np.ndarray
    kpass2: np.ndarray
    ipd_means2: np.ndarray
    pw_means2: np.ndarray
    sns: np.ndarray  # (N, 4)
    sns2: np.ndarray
    maps: np.ndarray
    maps2: np.ndarray
    ipd_stds: np.ndarray
    pw_stds: np.ndarray
    ipd_stds2: np.ndarray
    pw_stds2: np.ndarray
    labels: np.ndarray  # (N,)
    n_valid: int = 0

    def __len__(self) -> int:
        return len(self.read_idx)

    def model_feats(self) -> dict:
        return {
            "kmer": self.kmer, "kpass": self.kpass,
            "ipd_means": self.ipd_means, "pw_means": self.pw_means,
            "ipd_stds": self.ipd_stds, "pw_stds": self.pw_stds,
            "sns": self.sns, "maps": self.maps,
            "kmer2": self.kmer2, "kpass2": self.kpass2,
            "ipd_means2": self.ipd_means2, "pw_means2": self.pw_means2,
            "ipd_stds2": self.ipd_stds2, "pw_stds2": self.pw_stds2,
            "sns2": self.sns2, "maps2": self.maps2,
        }

    def pad_to(self, n: int) -> "FeatureBatch":
        cur = len(self)
        if cur == n:
            return dataclasses.replace(self, n_valid=cur)
        if cur > n:
            raise ValueError("batch longer than pad target")
        pad = n - cur

        def p(a):
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width, mode="constant")

        return FeatureBatch(**{
            f.name: (p(getattr(self, f.name)) if f.name != "n_valid" else cur)
            for f in dataclasses.fields(self)
        })


def batch_from_reads(reads: list[ReadFeatures], seq_len: int = 21) -> FeatureBatch | None:
    """Concatenate per-read feature arrays into one site batch (float32)."""
    reads = [r for r in reads if r is not None and r.n_sites > 0]
    if not reads:
        return None
    N = sum(r.n_sites for r in reads)
    L = seq_len

    def cat(fn, dtype=np.float32):
        return np.concatenate([np.asarray(fn(r), dtype=dtype) for r in reads], axis=0)

    read_idx = np.concatenate(
        [np.full(r.n_sites, i, dtype=np.int32) for i, r in enumerate(reads)]
    )
    zeros_l = lambda r: np.zeros((r.n_sites, L), np.float32)
    sn_of = lambda r: (
        np.broadcast_to(np.asarray(r.sn, np.float32), (r.n_sites, len(r.sn)))
        if r.sn is not None and len(np.atleast_1d(r.sn)) == 4
        else np.zeros((r.n_sites, 4), np.float32)
    )
    map_of = lambda which: lambda r: (
        np.asarray(getattr(r, which), np.float32)
        if getattr(r, which) is not None
        else np.zeros((r.n_sites, L), np.float32)
    )
    batch = FeatureBatch(
        read_idx=read_idx,
        locs=cat(lambda r: r.locs, np.int64),
        chrom_pos=cat(lambda r: r.chrom_pos, np.int64),
        kmer=cat(lambda r: r.fkmer),
        kpass=cat(lambda r: np.full((r.n_sites, L), r.npass_fwd, np.float32)),
        ipd_means=cat(lambda r: r.fipd),
        pw_means=cat(lambda r: r.fpw),
        kmer2=cat(lambda r: r.rkmer),
        kpass2=cat(lambda r: np.full((r.n_sites, L), r.npass_rev, np.float32)),
        ipd_means2=cat(lambda r: r.ripd),
        pw_means2=cat(lambda r: r.rpw),
        sns=np.concatenate([sn_of(r) for r in reads], axis=0),
        sns2=np.concatenate([sn_of(r) for r in reads], axis=0),
        maps=np.concatenate([map_of("fmap")(r) for r in reads], axis=0),
        maps2=np.concatenate([map_of("rmap")(r) for r in reads], axis=0),
        ipd_stds=np.concatenate([zeros_l(r) for r in reads], axis=0),
        pw_stds=np.concatenate([zeros_l(r) for r in reads], axis=0),
        ipd_stds2=np.concatenate([zeros_l(r) for r in reads], axis=0),
        pw_stds2=np.concatenate([zeros_l(r) for r in reads], axis=0),
        labels=cat(lambda r: np.full(r.n_sites, r.label), np.int32),
        n_valid=N,
    )
    return batch
