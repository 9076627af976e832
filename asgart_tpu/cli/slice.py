"""``asgart-slice``: combine/filter/convert ASGART JSON result files.

Flag- and behavior-compatible with the reference
(``src/bin/asgart-slice.rs``): same filter order (collapse → type filters →
min-length (min of arm lengths) → max-family-members → keep/restrict/
exclude fragments with ``-E`` regexp mode), same STDIN fallback, same
output selection.
"""

from __future__ import annotations

import argparse
import logging
import sys

from ..exporters import GFF2Exporter, GFF3Exporter, JSONExporter
from ..structs import RunResult
from ..utils import make_out_filename


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="asgart-slice",
        description="asgart-slice combines multiple ASGART JSON files into "
                    "a single output file in the desired format, and "
                    "features functions to filter, convert and collapse "
                    "data.")
    p.add_argument("inputs", nargs="*", help="The input file(s) to slice")
    p.add_argument("-f", "--format", choices=["json", "gff2", "gff3"],
                   default="json", help="Set the desired output format")
    p.add_argument("-o", "--output", default=None,
                   help="If specified, write the result to this file; "
                        "otherwise, write to STDOUT")
    p.add_argument("--no-direct", action="store_true",
                   help="Filter out direct duplications")
    p.add_argument("--no-reversed", action="store_true",
                   help="Filter out reversed duplications")
    p.add_argument("--no-complemented", action="store_true",
                   help="Filter out complemented duplications")
    p.add_argument("--no-uncomplemented", action="store_true",
                   help="Filter out non-complemented duplications")
    p.add_argument("-M", "--max-family-members", type=int, default=None,
                   help="Skip families with more duplicons than specified")
    p.add_argument("--no-inter", action="store_true",
                   help="Filters out inter-fragmental duplications")
    p.add_argument("--no-inter-relaxed", action="store_true",
                   help="Filters out inter-fragmental duplications, except "
                        "in the collapsed pseudo-chromosome")
    p.add_argument("--no-intra", action="store_true",
                   help="Filters out intra-fragmental duplications")
    p.add_argument("--min-length", type=int, default=None,
                   help="Filter duplicons shorter than the given value")
    p.add_argument("-C", "--collapse", action="store_true",
                   help="Merge all the smaller-than-average-plus-one-sigma "
                        "fragments into a single one")
    p.add_argument("--keep-fragments", nargs="+", default=None,
                   help="Ignore all duplicons not having at least an arm in "
                        "a fragment in the given list")
    p.add_argument("--restrict-fragments", nargs="+", default=None,
                   help="Ignore all duplicons not having both arms in a "
                        "fragment in the list")
    p.add_argument("--exclude-fragments", nargs="+", default=None,
                   help="Ignore all fragments in the given list")
    p.add_argument("-E", "--regexp", action="store_true",
                   help="Use regexp matching instead of literal for keep- "
                        "and exclude-fragments")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = logging.getLogger("asgart-slice")
    logging.basicConfig(level=logging.INFO, format="%(levelname)s - %(message)s")

    if args.no_inter and args.no_inter_relaxed:
        print("error: --no-inter-relaxed conflicts with --no-inter",
              file=sys.stderr)
        return 2

    if args.inputs:
        results = RunResult.from_files(args.inputs)
    else:
        log.warning("Reading results from STDIN")
        results = RunResult.from_stdin()

    exporter = {"json": JSONExporter, "gff2": GFF2Exporter,
                "gff3": GFF3Exporter}[args.format]()

    if args.collapse:
        results.flatten()
    if args.no_direct:
        results.remove_direct()
    if args.no_reversed:
        results.remove_reversed()
    if args.no_uncomplemented:
        results.remove_uncomplemented()
    if args.no_complemented:
        results.remove_complemented()
    if args.no_inter:
        results.remove_inter()
    if args.no_inter_relaxed:
        results.remove_inter_relaxed()
    if args.no_intra:
        results.remove_intra()
    if args.min_length is not None:
        for family in results.families:
            family[:] = [sd for sd in family
                         if min(sd.left_length, sd.right_length)
                         >= args.min_length]
        results.families = [f for f in results.families if f]
    if args.max_family_members is not None:
        results.max_family_members(args.max_family_members)
    if args.keep_fragments is not None:
        if args.regexp:
            for rx in args.keep_fragments:
                results.keep_fragments_regexp(rx)
        else:
            results.keep_fragments(args.keep_fragments)
    if args.restrict_fragments is not None:
        if args.regexp:
            for rx in args.restrict_fragments:
                results.restrict_fragments_regexp(rx)
        else:
            results.restrict_fragments(args.restrict_fragments)
    if args.exclude_fragments is not None:
        if args.regexp:
            for rx in args.exclude_fragments:
                results.exclude_fragments_regexp(rx)
        else:
            results.exclude_fragments(args.exclude_fragments)

    if args.output is not None:
        out_filename = make_out_filename(args.output, "out", args.format)
        with open(out_filename, "w") as fh:
            exporter.save(results, fh)
    else:
        exporter.save(results, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
