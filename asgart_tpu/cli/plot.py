"""``asgart-plot``: generate plots from ASGART results.

Flag-compatible with the reference (``src/bin/asgart-plot.rs``), including
GFF3/custom feature tracks and the SD↔feature proximity filters. The
reference's Flat↔Chord dispatch swap (asgart-plot.rs:507-508) is fixed
here: ``flat`` draws the flat plot and ``chord`` the chord plot.
"""

from __future__ import annotations

import argparse
import logging
import re
import sys

from ..plot import (AbsolutePosition, Feature, RelativePosition, Settings,
                    resolve_position)
from ..plot.chord import ChordPlotter
from ..plot.circos import CircosPlotter
from ..plot.colorizers import (FragmentColorizer, PositionColorizer,
                               TypeColorizer)
from ..plot.flat import FlatPlotter
from ..plot.genome import GenomePlotter
from ..plot.rosary import RosaryPlotter
from ..structs import RunResult
from ..utils import make_out_filename

log = logging.getLogger("asgart-plot")


def _proximity_overlap(x, y):
    """(asgart-plot.rs:25-30): endpoint-interval proximity test."""
    xstart, xlen = x
    ystart, ylen = y
    xend, yend = xstart + xlen, ystart + ylen
    return (ystart <= xstart <= yend) or (xstart <= ystart <= xend)


def _feature_window(result, position, threshold):
    start, length = resolve_position(result, position)
    return (start - threshold, length + 2 * threshold)


def _sd_near_any_feature(result, sd, features_families, threshold):
    for feature_family in features_families:
        for feature in feature_family:
            for position in feature.positions:
                window = _feature_window(result, position, threshold)
                if _proximity_overlap(sd.left_part(), window) or \
                        _proximity_overlap(sd.right_part(), window):
                    return True
    return False


def filter_families_in_features(result, features_families, threshold):
    """Keep families with at least one SD near a feature
    (asgart-plot.rs:20-70)."""
    result.families = [
        family for family in result.families
        if any(_sd_near_any_feature(result, sd, features_families, threshold)
               for sd in family)]


def filter_duplicons_in_features(result, features_families, threshold):
    """Keep only SDs near a feature (asgart-plot.rs:72-119)."""
    for family in result.families:
        family[:] = [sd for sd in family if _sd_near_any_feature(
            result, sd, features_families, threshold)]


def filter_features_in_sds(result, features_families, threshold):
    """Keep only features near an SD (asgart-plot.rs:121-163)."""
    for family in features_families:
        family[:] = [
            feature for feature in family
            if any(
                any(_proximity_overlap(
                        sd.left_part(),
                        _feature_window(result, p, threshold))
                    or _proximity_overlap(
                        sd.right_part(),
                        _feature_window(result, p, threshold))
                    for fam in result.families for sd in fam)
                for p in feature.positions)]


def read_gff3_feature_file(result, file) -> list[Feature]:
    """(asgart-plot.rs:175-213)"""
    features = []
    with open(file) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            fields = line.split("\t")
            start = int(fields[3])
            end = int(fields[4])
            if "Name=" in fields[8]:
                name = next(c for c in fields[8].split(";")
                            if "Name" in c).split("=")[1]
            else:
                name = fields[8]
            features.append(Feature(
                name=name,
                positions=[RelativePosition(
                    chr=fields[0], start=start, length=end - start)]))
    return features


def read_custom_feature_file(result, file) -> list[Feature]:
    """Custom ``label;start|chr+offset;length`` format
    (asgart-plot.rs:215-287)."""
    rx = re.compile(r"(.*)\+(\d+)")
    d: dict[str, list] = {}
    with open(file) as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            v = line.split(";")
            if len(v) != 3:
                raise ValueError(
                    f"{file}:L{i + 1} `{line}`: incorrect format, "
                    f"expecting two members, found {len(v)}")
            name = v[0]
            m = rx.match(v[1])
            if m:
                chr_name = m.group(1)
                position = int(m.group(2))
                chr_ = result.strand.find_chr(chr_name)
                if chr_ is None:
                    raise KeyError(f"Unable to find fragment `{chr_name}`")
                if chr_.length < position:
                    raise ValueError(
                        f"{position} greater than {chr_.name} length "
                        f"({chr_.length})")
                pos = RelativePosition(chr=chr_.name, start=position,
                                       length=int(v[2]))
            else:
                pos = AbsolutePosition(start=int(v[1]), length=int(v[2]))
            d.setdefault(name, []).append(pos)
    return [Feature(name=n, positions=ps) for n, ps in d.items()]


def read_feature_file(result, file) -> list[Feature]:
    if file.endswith(".gff3"):
        return read_gff3_feature_file(result, file)
    return read_custom_feature_file(result, file)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="asgart-plot",
        description="Generate plots from ASGART results")
    p.add_argument("files", nargs="*",
                   help="Input file(s); if not specified, JSON data is "
                        "expected on STDIN")
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("--out", default=None,
                   help="Define a non-default output file name")
    p.add_argument("--min-length", type=int, default=1000,
                   help="Filter duplicons shorter than the given value")
    p.add_argument("--min-identity", type=float, default=0.0,
                   help="Filter out duplicons with a lesser identity")
    p.add_argument("--max-identity", type=float, default=1.0,
                   help="Filter out duplicons with a higher identity")
    p.add_argument("--no-direct", action="store_true")
    p.add_argument("--no-reversed", action="store_true")
    p.add_argument("--no-complemented", action="store_true")
    p.add_argument("--no-uncomplemented", action="store_true")
    p.add_argument("--no-inter", action="store_true")
    p.add_argument("--no-intra", action="store_true")
    p.add_argument("--restrict-fragments", nargs="+", default=None)
    p.add_argument("--exclude-fragments", nargs="+", default=None)
    p.add_argument("--features", action="append", default=[],
                   help="Additional feature tracks to plot")
    p.add_argument("--filter-families", type=int, default=None)
    p.add_argument("--filter-duplicons", type=int, default=None)
    p.add_argument("--filter-features", type=int, default=None)
    p.add_argument("--min-thickness", type=float, default=0.1)
    p.add_argument("--colorize",
                   choices=["by-type", "by-position", "by-fragment", "none"],
                   default="by-type")
    return p


PLOT_KINDS = ("flat", "chord", "genome", "circos", "rosary")


def parse_args(argv):
    """clap-style parsing: free-form flags + files, with the plot kind as a
    trailing subcommand (argparse cannot mix nargs='*' positionals with
    subparsers, so the argv is split at the subcommand)."""
    if argv is None:
        argv = sys.argv[1:]
    split = next((i for i, a in enumerate(argv) if a in PLOT_KINDS), None)
    if split is None:
        build_parser().error(
            "missing plot kind (one of: " + ", ".join(PLOT_KINDS) + ")")
    args = build_parser().parse_args(argv[:split])
    args.plot = argv[split]
    sub = argparse.ArgumentParser(prog=f"asgart-plot {args.plot}")
    if args.plot == "rosary":
        sub.add_argument("--clustering", type=int, default=0)
        sub.add_argument("--rosary", action="store_true")
    sub_args = sub.parse_args(argv[split + 1:])
    for k, v in vars(sub_args).items():
        setattr(args, k, v)
    return args


def main(argv=None) -> int:
    args = parse_args(argv)
    level = [logging.WARNING, logging.INFO, logging.DEBUG][min(args.verbose, 2)]
    logging.basicConfig(level=level, format="%(levelname)s - %(message)s")

    if args.files:
        result = RunResult.from_files(args.files)
        out_file = make_out_filename(args.out, "-".join(args.files), "")
    else:
        log.warning("Reading results from STDIN")
        result = RunResult.from_stdin()
        out_file = make_out_filename(args.out, "out", "")

    feature_tracks = [read_feature_file(result, t) for t in args.features]

    if args.no_direct:
        result.remove_direct()
    if args.no_reversed:
        result.remove_reversed()
    if args.no_uncomplemented:
        result.remove_uncomplemented()
    if args.no_complemented:
        result.remove_complemented()
    if args.no_inter:
        result.remove_inter()
    if args.no_intra:
        result.remove_intra()
    if args.restrict_fragments is not None:
        log.info("Restricting to fragments %s", args.restrict_fragments)
        result.restrict_fragments(args.restrict_fragments)
    if args.exclude_fragments is not None:
        log.info("Ignoring fragments %s", args.exclude_fragments)
        result.exclude_fragments(args.exclude_fragments)

    for family in result.families:
        family[:] = [sd for sd in family
                     if max(sd.left_length, sd.right_length)
                     >= args.min_length]
    for family in result.families:
        family[:] = [sd for sd in family
                     if args.min_identity <= sd.identity <= args.max_identity]

    if args.filter_families is not None:
        filter_families_in_features(result, feature_tracks,
                                    args.filter_families)
    if args.filter_duplicons is not None:
        filter_duplicons_in_features(result, feature_tracks,
                                     args.filter_duplicons)
    if args.filter_features is not None:
        filter_features_in_sds(result, feature_tracks, args.filter_features)

    settings = Settings(
        out_file=str(out_file),
        size=200.0,
        min_thickness=args.min_thickness,
        color1="#ff5b00",
        color2="#00b2ae",
        feature_tracks=feature_tracks,
    )

    colorizer = {
        "by-type": lambda: TypeColorizer((1.0, 0.36, 0.0), (0.0, 0.70, 0.68)),
        "by-position": lambda: PositionColorizer(result),
        "by-fragment": lambda: FragmentColorizer(result),
        "none": lambda: TypeColorizer((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    }[args.colorize]()

    # NB: the reference swaps Flat↔Chord here (asgart-plot.rs:507-508);
    # fixed deliberately.
    if args.plot == "flat":
        FlatPlotter(settings, result, colorizer).plot()
    elif args.plot == "chord":
        ChordPlotter(settings, result, colorizer).plot()
    elif args.plot == "genome":
        GenomePlotter(settings, result, colorizer).plot()
    elif args.plot == "circos":
        CircosPlotter(settings, result, colorizer).plot()
    elif args.plot == "rosary":
        RosaryPlotter(settings, result, colorizer,
                      args.clustering, args.rosary).plot()
    return 0


if __name__ == "__main__":
    sys.exit(main())
