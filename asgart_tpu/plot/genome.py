"""Per-chromosome lane plot (``src/plot/genome_plot.rs``)."""

from __future__ import annotations

import logging

from . import Settings, fmt, sep
from ..structs import COLLAPSED_NAME

log = logging.getLogger("asgart-plot")


class GenomePlotter:
    def __init__(self, settings: Settings, result, colorizer):
        self.settings = settings
        self.result = result
        self.colorizer = colorizer

    def plot(self):
        out_filename = f"{self.settings.out_file}.svg"
        with open(out_filename, "w") as f:
            f.write(self.plot_genome())
        log.info("Genome plot written to `%s`", out_filename)

    def plot_genome(self) -> str:
        svg = []
        chr_spacing = 100.0
        chr_width = 40.0
        height_factor = 800.0
        longest = max((c.length for c in self.result.strand.map), default=0)
        if longest == 0:
            factor = 0.0
        else:
            factor = 1.0 / longest * height_factor

        width = int(chr_spacing) * (len(self.result.strand.map) + 1)
        height = height_factor + 50.0 + 100.0

        leftmost = chr_spacing - chr_width / 2.0
        rightmost = leftmost + (len(self.result.strand.map) - 1) \
            * chr_spacing + chr_width

        # Mbp scale lines
        for i in range(5_000_000, longest, 5_000_000):
            lw = 0.05 if i % 10_000_000 == 0 else 0.02
            font_size = 8 if i % 10_000_000 == 0 else 6
            color = "#444" if i % 10_000_000 == 0 else "#666"
            y = 50.0 + factor * i
            svg.append(
                f"<line x1='{fmt(leftmost)}' y1='{fmt(y)}' "
                f"x2='{fmt(rightmost)}' y2='{fmt(y)}' stroke='{color}' "
                f"stroke-width='{fmt(lw)}'/>\n")
            svg.append(
                f"<text x='{fmt(leftmost - 50.0)}' y='{fmt(y)}' "
                f"style='font-size: {font_size}px;' fill='{color}'>"
                f"{i // 1_000_000}Mbp</text>\n")

        # chromosome bars + delimiters + labels
        for i, chr_ in enumerate(self.result.strand.map):
            x = chr_spacing + i * chr_spacing
            y_end = 50.0 + factor * chr_.length
            svg.append(
                f"<line x1='{fmt(x)}' y1='50' x2='{fmt(x)}' "
                f"y2='{fmt(y_end)}' "
                f"stroke='{self.colorizer.color_fragment(chr_.name)}44' "
                f"stroke-width='{fmt(chr_width)}'/>\n")
            svg.append(
                f"<line x1='{fmt(x)}' y1='50' x2='{fmt(x)}' "
                f"y2='{fmt(y_end)}' stroke='#111' stroke-width='1' "
                f"stroke-dasharray='5,5'/>\n")
            for dx in (-chr_width / 4.0, chr_width / 4.0):
                svg.append(
                    f"<line x1='{fmt(x + dx)}' y1='50' x2='{fmt(x + dx)}' "
                    f"y2='{fmt(y_end)}' stroke='#222' stroke-width='0.5' "
                    f"stroke-dasharray='1,2'/>\n")
            label = chr_.name[0:3] if len(chr_.name) > 8 else chr_.name
            svg.append(
                f"<text x='{fmt(x - 10.0)}' y='{20 + (i % 2) * 10}' "
                f"style='font-size: 11;'>{label}</text>\n")

        # duplicon arms in 4 lanes: intra-direct, intra-palindromic,
        # inter-direct, inter-palindromic (genome_plot.rs:158-172)
        for family in self.result.families:
            for sd in family:
                color = self.colorizer.color(sd)
                intra = sd.chr_left == sd.chr_right
                if intra and not sd.reversed:
                    lane = -3.0 * chr_width / 8.0
                elif intra and sd.reversed:
                    lane = -1.0 * chr_width / 8.0
                elif not intra and not sd.reversed:
                    lane = 1.0 * chr_width / 8.0
                else:
                    lane = 3.0 * chr_width / 8.0

                title = (
                    f"{sd.chr_left}: {sep(sd.chr_left_position)} → "
                    f"{sep(sd.chr_left_position + sd.left_length)}  "
                    f"({sep(sd.left_length)}bp)\n"
                    f"{sd.chr_right}: {sep(sd.chr_right_position)} → "
                    f"{sep(sd.chr_right_position + sd.right_length)} "
                    f"({sep(sd.right_length)}bp)")

                def arm(chr_name, pos, length, invert_min=False):
                    if chr_name == COLLAPSED_NAME:
                        return
                    idx = self.result.strand.find_chr_index(chr_name)
                    if idx is None:
                        return
                    x = chr_spacing + lane + chr_spacing * idx
                    start = factor * pos
                    end = factor * (pos + length)
                    # the reference's left-arm min-thickness check is
                    # inverted (start - end, genome_plot.rs:180); preserved
                    if invert_min:
                        if start - end < self.settings.min_thickness:
                            end = start + self.settings.min_thickness
                    else:
                        if end - start < self.settings.min_thickness:
                            end = start + self.settings.min_thickness
                    svg.append(
                        f"<line x1='{fmt(x)}' y1='{fmt(50.0 + start)}' "
                        f"x2='{fmt(x)}' y2='{fmt(50.0 + end)}' "
                        f"stroke='{color}' "
                        f"stroke-width='{fmt(chr_width / 4.0)}'>"
                        f"<title>{title}</title></line>\n")

                arm(sd.chr_left, sd.chr_left_position, sd.left_length,
                    invert_min=True)
                arm(sd.chr_right, sd.chr_right_position, sd.right_length)

        body = "".join(svg)
        return (
            "\n<!DOCTYPE svg PUBLIC '-//W3C//DTD SVG 1.0//EN' "
            "'http://www.w3.org/TR/2001/REC-SVG-20010904/DTD/svg10.dtd'>\n"
            f"<svg version='1.0' width='{width}' height='{fmt(height)}' "
            "xmlns='http://www.w3.org/2000/svg' "
            "xmlns:xlink='http://www.w3.org/1999/xlink'>\n"
            f"{body}\n</svg>")
