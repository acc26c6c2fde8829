from .bam import BamHeader, BamReader, BamRecord, BamWriter, sort_bam_in_memory
from .bgzf import BgzfReader, BgzfWriter
from .bai import build_index, fetch_region, index_bam_if_needed

__all__ = [
    "BamHeader",
    "BamReader",
    "BamRecord",
    "BamWriter",
    "BgzfReader",
    "BgzfWriter",
    "sort_bam_in_memory",
    "build_index",
    "fetch_region",
    "index_bam_if_needed",
]
