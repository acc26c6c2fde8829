"""Test-facing shim: the synthetic HiFi generator lives in the package
(ccsmeth_tpu/utils/simulate.py) so examples and users can call it too."""

import numpy as np

from ccsmeth_tpu.utils.simulate import (  # noqa: F401
    BASES,
    make_read,
    make_synth_bam,
    random_seq,
    write_fasta,
)


def example_feats(B, L=21, seed=0, optional="zeros"):
    """Synthetic two-strand feature dict in the model-input layout (the one
    builder shared by the kernel/transfer/scaling tests; bench.py carries its
    own copy to stay standalone). optional='random' fills the optional
    channels (stds/sn/map) with random values instead of zeros."""
    rng = np.random.RandomState(seed)
    opt = (lambda *s: rng.rand(*s).astype(np.float32)) if optional == "random" \
        else (lambda *s: np.zeros(s, np.float32))
    feats = {}
    for s in ("", "2"):
        feats["kmer" + s] = rng.randint(0, 5, (B, L)).astype(np.float32)
        feats["kpass" + s] = np.full((B, L), 8.0, np.float32)
        feats["ipd_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["pw_means" + s] = rng.randn(B, L).astype(np.float32)
        feats["ipd_stds" + s] = opt(B, L)
        feats["pw_stds" + s] = opt(B, L)
        feats["sns" + s] = opt(B, 4)
        feats["maps" + s] = opt(B, L)
    return feats
