from .bam import BamHeader, BamReader, BamRecord, BamWriter, sort_bam_in_memory
from .bgzf import BgzfReader, BgzfWriter

__all__ = [
    "BamHeader",
    "BamReader",
    "BamRecord",
    "BamWriter",
    "BgzfReader",
    "BgzfWriter",
    "sort_bam_in_memory",
]
