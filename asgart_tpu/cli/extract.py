"""``asgart-extract``: pull duplicon sequences out of an ASGART JSON file.

Behavior-compatible with the reference (``src/bin/asgart-extract.rs``):
re-reads the original FASTAs (searched across ``--locations``), then either
embeds each duplicon's sequences into the JSON (``--in-place`` →
``left_seq``/``right_seq``, the right arm un-reversed/un-complemented) or
appends per-family multiFASTA files ``family-<i>.fa``.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from ..exporters import JSONExporter
from ..structs import RunResult
from ..utils import complemented

log = logging.getLogger("asgart-extract")


def read_fasta_raw(filename: str) -> bytes:
    """Concatenate all records' raw sequences (no normalization), like the
    extract tool's reader (asgart-extract.rs:17-29)."""
    parts: list[bytes] = []
    with open(filename, "rb") as fh:
        for line in fh:
            line = line.rstrip(b"\r\n")
            if line.startswith(b">") or not line:
                continue
            parts.append(line)
    return b"".join(parts)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="asgart-extract",
        description="asgart-extract pulls out duplication families from an "
                    "ASGART JSON file into a serie of FASTA files, one per "
                    "family.")
    p.add_argument("input", help="The JSON file to process")
    p.add_argument("-l", "--locations", nargs="+", default=None,
                   help="Where to find the original FASTA files")
    p.add_argument("-I", "--in-place", action="store_true",
                   help="Write the sequences directly into the input JSON "
                        "files")
    p.add_argument("-D", "--dump", action="store_true",
                   help="Dump the sequences into multiFASTA files")
    p.add_argument("-d", "--destination", default=None,
                   help="Where to write the output multiFASTA files")
    return p


def _arm_seqs(strand: bytes, sd) -> tuple[bytes, bytes]:
    import numpy as np

    left_seq = strand[sd.global_left_position:
                      sd.global_left_position + sd.left_length]
    right_seq = strand[sd.global_right_position:
                       sd.global_right_position + sd.right_length]
    if sd.reversed:
        right_seq = right_seq[::-1]
    if sd.complemented:
        right_seq = complemented(
            np.frombuffer(right_seq, dtype=np.uint8)).tobytes()
    return left_seq, right_seq


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s - %(message)s")

    if not args.in_place and not args.dump:
        print("Please specify at least one of `--in-place` or `--dump`; "
              "see --help for more details", file=sys.stderr)
        return 1
    destination = (args.destination or "./") + "/"
    if not os.path.isdir(destination):
        print(f"`{destination}` is not a valid directory", file=sys.stderr)
        return 1
    locations = args.locations or ["."]

    log.info("Reading %s...", args.input)
    result = RunResult.from_files([args.input])

    strands_files = []
    for name in (n.strip() for n in result.strand.name.split(",")):
        for location in locations:
            path = f"{location}/{name}"
            if os.path.exists(path):
                strands_files.append(path)
                break
        else:
            print(f"Unable to find {name} in the locations provided "
                  f"({', '.join(locations)})", file=sys.stderr)
            return 1

    strand = b"".join(read_fasta_raw(f) for f in strands_files)

    if args.in_place:
        for family in result.families:
            for sd in family:
                left_seq, right_seq = _arm_seqs(strand, sd)
                sd.left_seq = left_seq.decode()
                sd.right_seq = right_seq.decode()
        with open(args.input, "w") as fh:
            JSONExporter().save(result, fh)
    if args.dump:
        for i, family in enumerate(result.families):
            out_file_name = f"{destination}family-{i}.fa"
            with open(out_file_name, "ab") as fh:
                for j, sd in enumerate(family):
                    left_seq, right_seq = _arm_seqs(strand, sd)
                    fh.write(
                        f">chr:{sd.chr_left};start:{sd.chr_left_position};"
                        f"end:{sd.chr_left_position + sd.left_length};"
                        f"family:{i};duplicon:{j}-1;"
                        f"length:{sd.left_length}\n".encode())
                    fh.write(left_seq + b"\n")
                    fh.write(
                        f">chr:{sd.chr_right};start:{sd.chr_right_position};"
                        f"end:{sd.chr_right_position + sd.right_length};"
                        f"family:{i};duplicon:{j}-2;"
                        f"length:{sd.right_length}\n".encode())
                    fh.write(right_seq + b"\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
