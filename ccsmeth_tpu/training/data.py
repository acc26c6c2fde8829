"""Feature-TSV training data: columnar in-memory dataset + shuffled batch iterator.

Replaces the reference's per-item linecache Datasets
(/root/reference/ccsmeth/dataloader.py:50-149) with one vectorized parse into
columnar float32 arrays — random access is then pure numpy fancy-indexing, the
natural feeder for fixed-shape jit batches (and orders of magnitude faster than
line-at-a-time parsing).
"""

from __future__ import annotations

import gzip

import numpy as np

from ..utils.constants import BASE2CODE_DNA

_FEATURE_KEYS = (
    "kmer", "kpass", "ipd_means", "ipd_stds", "pw_means", "pw_stds", "sns", "maps",
    "kmer2", "kpass2", "ipd_means2", "ipd_stds2", "pw_means2", "pw_stds2", "sns2",
    "maps2",
)
_FEATURE_KEYS_SS = (
    "kmer", "kpass", "ipd_means", "ipd_stds", "pw_means", "pw_stds", "sns", "maps",
)


def load_feature_tsv(path: str, seq_len: int = 21,
                     single_strand: bool = False) -> dict[str, np.ndarray]:
    """Parse a (possibly gzipped) feature TSV into columnar arrays — 22 columns for
    two-strand rows, 14 for single-strand (reference dataloader.py:198-218,
    parse_a_liness). Kmer columns longer than seq_len are center-truncated like
    the reference formatter (_call_modifications_txt.py:159-166).
    """
    if single_strand:
        return _load_feature_tsv_ss(path, seq_len)
    opener = gzip.open if path.endswith(".gz") else open
    base_lut = np.full(256, 4, dtype=np.float32)
    for b, c in BASE2CODE_DNA.items():
        base_lut[ord(b)] = c

    cols: dict[str, list] = {k: [] for k in _FEATURE_KEYS}
    labels: list[int] = []

    def vec(txt: str, lc: int, rc: int, n: int) -> np.ndarray:
        if txt == ".":
            return np.zeros(n, np.float32)
        return np.asarray(txt.split(",")[lc:rc], dtype=np.float32)

    def sn_vec(txt: str) -> np.ndarray:
        if txt == ".":
            return np.zeros(4, np.float32)
        return np.asarray(txt.split(","), dtype=np.float32)

    lc = rc = None
    with opener(path, "rt") as rf:
        for line in rf:
            w = line.rstrip("\n").split("\t")
            if len(w) < 22:
                continue
            if lc is None:
                oriklen = len(w[5])
                if oriklen >= seq_len:
                    lc = (oriklen - seq_len) // 2
                    rc = oriklen - lc
                else:
                    raise ValueError("feature kmer shorter than --seq_len")
            kb = np.frombuffer(w[5][lc:rc].encode(), np.uint8)
            cols["kmer"].append(base_lut[kb])
            cols["kpass"].append(np.full(seq_len, float(int(w[6])), np.float32))
            cols["ipd_means"].append(vec(w[7], lc, rc, seq_len))
            cols["ipd_stds"].append(vec(w[8], lc, rc, seq_len))
            cols["pw_means"].append(vec(w[9], lc, rc, seq_len))
            cols["pw_stds"].append(vec(w[10], lc, rc, seq_len))
            cols["sns"].append(sn_vec(w[11]))
            cols["maps"].append(vec(w[12], lc, rc, seq_len))
            kb2 = np.frombuffer(w[13][lc:rc].encode(), np.uint8)
            cols["kmer2"].append(base_lut[kb2])
            cols["kpass2"].append(np.full(seq_len, float(int(w[14])), np.float32))
            cols["ipd_means2"].append(vec(w[15], lc, rc, seq_len))
            cols["ipd_stds2"].append(vec(w[16], lc, rc, seq_len))
            cols["pw_means2"].append(vec(w[17], lc, rc, seq_len))
            cols["pw_stds2"].append(vec(w[18], lc, rc, seq_len))
            cols["sns2"].append(sn_vec(w[19]))
            cols["maps2"].append(vec(w[20], lc, rc, seq_len))
            labels.append(int(w[21]))
    data = {k: np.stack(v).astype(np.float32) for k, v in cols.items() if v}
    data["labels"] = np.asarray(labels, dtype=np.int32)
    return data


def _load_feature_tsv_ss(path: str, seq_len: int) -> dict[str, np.ndarray]:
    opener = gzip.open if path.endswith(".gz") else open
    base_lut = np.full(256, 4, dtype=np.float32)
    for b, c in BASE2CODE_DNA.items():
        base_lut[ord(b)] = c
    cols: dict[str, list] = {k: [] for k in _FEATURE_KEYS_SS}
    labels: list[int] = []

    def vec(txt, lc, rc, n):
        if txt == ".":
            return np.zeros(n, np.float32)
        return np.asarray(txt.split(",")[lc:rc], dtype=np.float32)

    lc = rc = None
    with opener(path, "rt") as rf:
        for line in rf:
            w = line.rstrip("\n").split("\t")
            if len(w) < 14:
                continue
            if lc is None:
                oriklen = len(w[5])
                if oriklen < seq_len:
                    raise ValueError("feature kmer shorter than --seq_len")
                lc = (oriklen - seq_len) // 2
                rc = oriklen - lc
            kb = np.frombuffer(w[5][lc:rc].encode(), np.uint8)
            cols["kmer"].append(base_lut[kb])
            cols["kpass"].append(np.full(seq_len, float(int(w[6])), np.float32))
            cols["ipd_means"].append(vec(w[7], lc, rc, seq_len))
            cols["ipd_stds"].append(vec(w[8], lc, rc, seq_len))
            cols["pw_means"].append(vec(w[9], lc, rc, seq_len))
            cols["pw_stds"].append(vec(w[10], lc, rc, seq_len))
            cols["sns"].append(np.zeros(4, np.float32) if w[11] == "." else
                               np.asarray(w[11].split(","), dtype=np.float32))
            cols["maps"].append(vec(w[12], lc, rc, seq_len))
            labels.append(int(w[13]))
    data = {k: np.stack(v).astype(np.float32) for k, v in cols.items() if v}
    data["labels"] = np.asarray(labels, dtype=np.int32)
    return data


class FeatureDataset:
    def __init__(self, data: dict[str, np.ndarray]):
        self.data = data
        self.n = len(data["labels"])

    @classmethod
    def from_tsv(cls, path: str, seq_len: int = 21,
                 single_strand: bool = False) -> "FeatureDataset":
        return cls(load_feature_tsv(path, seq_len, single_strand))

    def __len__(self) -> int:
        return self.n

    def batches(self, batch_size: int, shuffle: bool, rng: np.random.RandomState,
                drop_remainder: bool = False, pad_to: int | None = None,
                shard: tuple[int, int] | None = None):
        """Yield (feats dict, labels, n_valid). With pad_to, ragged tails are
        zero-padded to fixed shape. With shard=(i, n), yields every n-th batch —
        per-host sharding for multi-host training (DistributedSampler analog)."""
        idx = np.arange(self.n)
        if shuffle:
            rng.shuffle(idx)
        b = 0
        for s in range(0, self.n, batch_size):
            sel = idx[s : s + batch_size]
            if len(sel) < batch_size and drop_remainder:
                break
            b += 1
            if shard is not None and (b - 1) % shard[1] != shard[0]:
                continue
            feats = {k: self.data[k][sel] for k in _FEATURE_KEYS if k in self.data}
            labels = self.data["labels"][sel]
            n_valid = len(sel)
            if pad_to is not None and n_valid < pad_to:
                pad = pad_to - n_valid
                feats = {k: np.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
                         for k, v in feats.items()}
                labels = np.pad(labels, (0, pad))
            yield feats, labels, n_valid
