#!/usr/bin/env python
"""Shuffle a large text file with bounded memory (chunked shuffle + round-robin
merge). Capability parity with /root/reference/scripts/shuffle_a_big_file.py.
"""

import argparse
import os
import random
import tempfile


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp", type=str, required=True)
    parser.add_argument("--wfp", type=str, required=True)
    parser.add_argument("--lines_per_chunk", "--num_lines_shuffle",
                        dest="lines_per_chunk", type=int, default=2000000)
    parser.add_argument("--num_samples_per_file", type=int, default=None,
                        help="take at most N lines (reference interface)")
    parser.add_argument("--header", type=str, default="no",
                        help="yes/no: first line is a header")
    parser.add_argument("--temp_dir", type=str, default=None,
                        help="directory for shuffle chunk temp files")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    random.seed(args.seed)
    tmpdir = tempfile.mkdtemp(
        dir=args.temp_dir or os.path.dirname(os.path.abspath(args.wfp)) or ".")
    has_header = args.header.lower() in ("yes", "true", "1")
    header_line = None
    cap = args.num_samples_per_file
    taken = 0
    chunk_files = []
    chunk = []
    with open(args.fp) as rf:
        if has_header:
            header_line = rf.readline()
        for line in rf:
            if cap is not None and taken >= cap:
                break
            taken += 1
            chunk.append(line)
            if len(chunk) >= args.lines_per_chunk:
                random.shuffle(chunk)
                p = os.path.join(tmpdir, "chunk{}.tmp".format(len(chunk_files)))
                with open(p, "w") as wf:
                    wf.writelines(chunk)
                chunk_files.append(open(p))
                chunk = []
    random.shuffle(chunk)
    with open(args.wfp, "w") as wf:
        if header_line is not None:
            wf.write(header_line)
        if not chunk_files:
            wf.writelines(chunk)
        else:
            # keep the tail chunk in memory and round-robin-drain all sources
            import io

            chunk_files.append(io.StringIO("".join(chunk)))
            live = list(chunk_files)
            while live:
                src = random.choice(live)
                line = src.readline()
                if not line:
                    live.remove(src)
                    continue
                wf.write(line)
    for f in chunk_files:
        f.close()
    for name in os.listdir(tmpdir):
        os.remove(os.path.join(tmpdir, name))
    os.rmdir(tmpdir)
    print("shuffled -> {}".format(args.wfp))


if __name__ == "__main__":
    main()
