"""Micro-benchmark for the native BGZF codec (compress + decompress MB/s).

Payload mixes text-like TSV bytes and binary BAM-like bytes, matching the
engine's two real workloads. Usage: python ops_experiments/bgzf_bench.py [MB]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ccsmeth_tpu.bamio import native


def payload(mb: int) -> bytes:
    rng = np.random.RandomState(0)
    text = (b"chr20\t1000%d\t+\tm54238_180901_011437/%d/ccs\t%d\t0.9%d\n"
            % (1, 4194368, 7, 5)) * 2000
    binary = rng.randint(0, 256, size=1 << 20, dtype=np.uint8).tobytes()
    seqlike = rng.randint(0, 16, size=1 << 20, dtype=np.uint8).tobytes()
    unit = text + binary[: 1 << 18] + seqlike
    reps = max(1, (mb << 20) // len(unit))
    return (unit * reps)[: mb << 20]


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    data = payload(mb)
    assert native.native_available(), "native lib missing"
    for threads in (1, 4, 8):
        comp = native.compress_bgzf_bytes(data, 6, threads)
        t0 = time.perf_counter()
        comp = native.compress_bgzf_bytes(data, 6, threads)
        tc = time.perf_counter() - t0
        dec = native.decompress_bgzf_bytes(comp, threads)
        t0 = time.perf_counter()
        dec = native.decompress_bgzf_bytes(comp, threads)
        td = time.perf_counter() - t0
        assert dec == data
        print("threads=%d  compress %.0f MB/s  decompress %.0f MB/s  ratio %.2f"
              % (threads, mb / tc, mb / td, len(data) / len(comp)), flush=True)


if __name__ == "__main__":
    main()
