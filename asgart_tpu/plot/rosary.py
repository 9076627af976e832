"""Rosary plot: non-linear large-scale view (``src/plot/rosary_plot.rs``).

Per fragment, duplicons closer than ``--clustering`` merge into spans;
voids render as circles (r ∝ √len), duplication spans as squares (∝ len);
colors orange / teal / purple (mixed); ``--rosary`` splits voids into
≤10 Mbp beads.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import Optional

from . import (Circle, Line, RelativePosition, Settings, SvgGroup, Text,
               sep)

log = logging.getLogger("asgart-plot")

SCALES = [
    (100_000, "100kbp"),
    (1_000_000, "1Mbp"),
    (5_000_000, "5Mbp"),
    (10_000_000, "10Mbp"),
    (50_000_000, "50Mbp"),
]


@dataclass
class Span:
    start: int
    length: int
    # None = feature; else (reversed, complemented, both)
    duplicon: Optional[tuple] = None


def size_for_feature(l: float) -> float:
    return l / 10_000.0


def size_for_void(l: float) -> float:
    return math.sqrt(l / 100_000.0)


class RosaryPlotter:
    def __init__(self, settings: Settings, result, colorizer,
                 clustering_margin: int, rosary_mode: bool):
        log.info("Clustering margin: %dbp", clustering_margin)
        self.settings = settings
        self.result = result
        self.colorizer = colorizer
        self.clustering_margin = clustering_margin
        self.rosary_mode = rosary_mode

    def plot(self):
        out_filename = f"{self.settings.out_file}.svg"
        with open(out_filename, "w") as f:
            f.write(self.plot_squish())
        log.info("Rosary plot written to `%s`", out_filename)

    def annotations_for_chr(self, chr_) -> list[Span]:
        out = []
        for family in self.settings.feature_tracks:
            for feature in family:
                for position in feature.positions:
                    if isinstance(position, RelativePosition):
                        my_chr = self.result.strand.find_chr(position.chr)
                        if my_chr is None:
                            raise KeyError(
                                f"Unable to find fragment `{position.chr}`")
                        if my_chr.name == chr_.name:
                            out.append(Span(position.start, position.length))
                    else:
                        raise NotImplementedError(
                            "absolute feature positions are not supported "
                            "by the rosary plot")
        return out

    def duplicons_for_chr(self, chr_) -> list[Span]:
        proto = []
        for family in self.result.families:
            for sd in family:
                if sd.chr_left == chr_.name or sd.chr_right == chr_.name:
                    for (name, pos, length) in [
                            (sd.chr_left, sd.chr_left_position,
                             sd.left_length),
                            (sd.chr_right, sd.chr_right_position,
                             sd.right_length)]:
                        if name == chr_.name:
                            proto.append(Span(
                                pos, length,
                                (sd.reversed, sd.complemented, False)))
        proto.sort(key=lambda s: s.start)

        duplicons: list[Span] = []
        for new in proto:
            if duplicons:
                last = duplicons[-1]
                if new.start <= last.start + last.length \
                        + self.clustering_margin:
                    last.length = new.start + new.length - last.start
                    if last.duplicon is not None and new.duplicon is not None:
                        old_r, old_c, both = last.duplicon
                        new_r, new_c, _ = new.duplicon
                        if old_r != new_r or old_c != new_c:
                            last.duplicon = (old_r, old_c, True)
                    continue
            duplicons.append(new)
        return duplicons

    def _draw_commands(self, chr_):
        duplicons = self.duplicons_for_chr(chr_)
        annotations = self.annotations_for_chr(chr_)
        features = sorted(duplicons + annotations, key=lambda s: s.start)

        cmds = []  # ("distance", d) | ("feature", length, color)
        pos = 0
        for span in features:
            distance = span.start - pos
            if self.rosary_mode:
                while distance > 0:
                    if distance > 10_000_000:
                        cmds.append(("distance", 10_000_000))
                        distance -= 10_000_000
                    elif distance > 1_000_000:
                        cmds.append(("distance", 1_000_000))
                        distance -= 1_000_000
                    elif distance > 100_000:
                        cmds.append(("distance", 100_000))
                        distance -= 100_000
                    else:
                        cmds.append(("distance", distance))
                        distance = 0
            else:
                cmds.append(("distance", distance))

            if span.duplicon is not None:
                reversed_, complemented, both = span.duplicon
                if not both:
                    color = "#00b2ae" if (reversed_ and complemented) \
                        else "#ff5b00"
                else:
                    color = "#9741ad"
            else:
                color = "#66491e"
            cmds.append(("feature", span.length, color))
            pos = span.start + span.length
        if pos < chr_.length:
            cmds.append(("distance", chr_.length - pos))
        return cmds

    def plot_squish(self) -> str:
        chr_draw_commands = [self._draw_commands(c)
                             for c in self.result.strand.map]

        largest_bead = max(
            (c[1] for cmds in chr_draw_commands for c in cmds
             if c[0] == "distance"), default=0)
        largest_square = max(
            (c[1] for cmds in chr_draw_commands for c in cmds
             if c[0] == "feature"), default=0)

        # captions
        beads_text = Text(0.0, 0.0, "Duplications-devoid regions")
        captions_beads = SvgGroup().push(beads_text)
        x, y = 0.0, beads_text.dims()[1] + 5.0
        for (l, label) in SCALES:
            if l > largest_bead:
                continue
            r = size_for_void(float(l))
            text = Text(x, y, label)
            bead = Circle(x + text.dims()[0] / 3.0,
                          y + text.dims()[1] + 5.0, r, "#555555")
            captions_beads.push(bead).push(text)
            x = x + text.dims()[0] + bead.dims()[0] + 10.0

        squares_text = Text(0.0, 0.0, "Duplications-rich regions")
        captions_squares = SvgGroup().push(squares_text)
        x, y = 0.0, squares_text.dims()[1] + 5.0
        for (l, label) in SCALES:
            if l > largest_square:
                continue
            w = size_for_feature(float(l))
            text = Text(x, y, label)
            square = Line(x + text.dims()[0] / 3.0,
                          y + text.dims()[1] + 5.0,
                          x + text.dims()[0] / 3.0,
                          y + text.dims()[1] + w + 5.0,
                          stroke="#bbb", stroke_width=w)
            captions_squares.push(square).push(text)
            x = x + text.dims()[0] + square.dims()[0] + 10.0

        captions = SvgGroup() \
            .append(captions_squares.shift(
                0.0, captions_beads.dims()[1] + 15.0)) \
            .append(captions_beads)

        labels = [Text(0.0, 0.0, c.name) for c in self.result.strand.map]
        label_space = 5.0 + max(
            (int(t.dims()[0] + 1.0) for t in labels), default=0)

        chrs = []
        for cmds in chr_draw_commands:
            g = SvgGroup()
            x = label_space
            for cmd in cmds:
                if cmd[0] == "distance":
                    r = size_for_void(float(cmd[1]))
                    g.push(Circle(x + r, 0.0, r, "#555555"))
                    x += 2.0 * r
                else:
                    _, length, color = cmd
                    width = size_for_feature(float(length))
                    g.push(Line(
                        x, 0.0, x + width, 0.0, stroke=color,
                        stroke_width=width,
                        hover=f"na → na  ({sep(length)}bp)"))
                    x += width
            chrs.append(g)

        main_plot = SvgGroup()
        y = 0.0
        for label, chr_g in zip(labels, chrs):
            height = max(label.dims()[1], chr_g.dims()[1])
            shift = y + height / 2.0
            label.shift(0.0, shift)
            main_plot.push(label).append(chr_g.shift(0.0, shift))
            y = y + height + 10.0
        main_plot.shift(0.0, captions.dims()[1] + 20.0)

        all_ = SvgGroup().append(captions).append(main_plot).shift(10.0, 10.0)
        w, h = all_.dims()
        from . import fmt
        return (
            "<?xml version='1.0' encoding='UTF-8'  standalone='no' ?> "
            "<!DOCTYPE svg PUBLIC '-//W3C//DTD SVG 1.0//EN' "
            "'http://www.w3.org/TR/2001/REC-SVG-20010904/DTD/svg10.dtd'> "
            f"<svg version='1.0' width='{fmt(w + 10.0)}' "
            f"height='{fmt(h + 10.0)}' "
            "xmlns='http://www.w3.org/2000/svg' "
            "xmlns:xlink='http://www.w3.org/1999/xlink'>\n "
            f"{all_.render()} </svg>")
