"""Test-facing shim: the synthetic HiFi generator lives in the package
(ccsmeth_tpu/utils/simulate.py) so examples and users can call it too."""

from ccsmeth_tpu.utils.simulate import (  # noqa: F401
    BASES,
    make_read,
    make_synth_bam,
    random_seq,
    write_fasta,
)
