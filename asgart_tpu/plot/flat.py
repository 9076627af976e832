"""Flat (two-bar) plot (``src/plot/flat_plot.rs``)."""

from __future__ import annotations

import logging
import random

from . import Settings, fmt, resolve_position, sep

CHR_WIDTH = 4.0

log = logging.getLogger("asgart-plot")


class FlatPlotter:
    def __init__(self, settings: Settings, result, colorizer, seed: int = 0):
        self.settings = settings
        self.result = result
        self.colorizer = colorizer
        self.max_length = float(result.strand.length)
        self.width = 1500.0
        self.height = 230.0
        self.rng = random.Random(seed)

    def plot(self):
        out_filename = f"{self.settings.out_file}.svg"
        with open(out_filename, "w") as f:
            f.write(self.plot_flat())
        log.info("Flat plot written to `%s`", out_filename)

    def plot_flat(self) -> str:
        svg = []
        offset = 0
        for j, chr_ in enumerate(self.result.strand.map):
            x_start = offset / self.max_length * self.width
            x_end = (offset + chr_.length) / self.max_length * self.width
            color = self.colorizer.color_fragment(chr_.name)
            svg.append(
                f"<line x1='{fmt(x_start)}' y1='{fmt(CHR_WIDTH / 2.0)}' "
                f"x2='{fmt(x_end)}' y2='{fmt(CHR_WIDTH / 2.0)}' "
                f"stroke='{color}' stroke-width='{fmt(CHR_WIDTH)}'/>")
            svg.append(
                f"<line x1='{fmt(x_start)}' "
                f"y1='{fmt(self.height - CHR_WIDTH / 2.0)}' "
                f"x2='{fmt(x_end)}' "
                f"y2='{fmt(self.height - CHR_WIDTH / 2.0)}' "
                f"stroke='{color}' stroke-width='{fmt(CHR_WIDTH)}'/>")
            svg.append(
                f"<text x='{fmt(x_start)}' y='{fmt(self.height + 35.0)}' "
                f"font-family='Helvetica' font-size='12'>{chr_.name}</text>")

            # Mb tick marks (1/5/10 Mbp heights)
            for i in range(0, chr_.length, 1_000_000):
                if i % 10_000_000 == 0:
                    h = self.height + 7.0
                elif i % 5_000_000 == 0:
                    h = self.height + 5.0
                else:
                    h = self.height + 3.0
                x = (i + offset) / self.max_length * self.width
                svg.append(
                    f"<line x1='{fmt(x)}' y1='{fmt(self.height)}' "
                    f"x2='{fmt(x)}' y2='{fmt(h)}' stroke='#898989' "
                    f"stroke-width='1'/>")
                if i % 10_000_000 == 0:
                    y = self.height + 15.0 + (j % 2) * 5.0
                    svg.append(
                        f"<text x='{fmt(x)}' y='{fmt(y)}' "
                        f"font-family='Helvetica' font-size='8'>"
                        f"{i // 1_000_000}Mb</text>")
            offset += chr_.length

        for features_family in self.settings.feature_tracks:
            for feature in features_family:
                for position in feature.positions:
                    start, length = resolve_position(self.result, position)
                    end = start + length
                    color = "#{:02X}{:02X}{:02X}".format(
                        self.rng.randrange(256), self.rng.randrange(256),
                        self.rng.randrange(256))
                    x0 = start / self.max_length * self.width
                    x1 = end / self.max_length * self.width
                    x2 = x1 + 2.0
                    x3 = x0 - 2.0
                    font_size = 8.0
                    svg.append(
                        f"<polygon points='{fmt(x0)},{fmt(self.height)} "
                        f"{fmt(x1)},{fmt(self.height)} "
                        f"{fmt(x2)},{fmt(self.height + 10.0)} "
                        f"{fmt(x3)},{fmt(self.height + 10.0)}' "
                        f"style='fill:{color};'/>\n")
                    svg.append(
                        f"<text x='{fmt(x0)}' "
                        f"y='{fmt(self.height + 20.0 + font_size)}' "
                        f"font-family='sans-serif' "
                        f"font-size='{fmt(font_size)}' "
                        f"style='writing-mode: tb;'>{feature.name}</text>")

        for family in self.result.families:
            for sd in family:
                left1 = sd.global_left_position / self.max_length * self.width
                left2 = (sd.global_left_position + sd.left_length) \
                    / self.max_length * self.width
                right1 = sd.global_right_position / self.max_length * self.width
                right2 = (sd.global_right_position + sd.right_length) \
                    / self.max_length * self.width
                color = self.colorizer.color(sd)
                lx = left1 + self.settings.min_thickness \
                    if left2 - left1 < self.settings.min_thickness else left2
                rx = right1 + self.settings.min_thickness \
                    if right2 - right1 < self.settings.min_thickness else right2
                title = (
                    f"{sd.chr_left}: {sep(sd.chr_left_position)} → "
                    f"{sep(sd.chr_left_position + sd.left_length)}  "
                    f"({sep(sd.left_length)}bp)\n"
                    f"{sd.chr_right}: {sep(sd.chr_right_position)} → "
                    f"{sep(sd.chr_right_position + sd.right_length)} "
                    f"({sep(sd.right_length)}bp)")
                svg.append(
                    f"\n<polygon\npoints='{fmt(left1)},{fmt(CHR_WIDTH)} "
                    f"{fmt(lx)},{fmt(CHR_WIDTH)} "
                    f"{fmt(rx)},{fmt(self.height - CHR_WIDTH)} "
                    f"{fmt(right1)},{fmt(self.height - CHR_WIDTH)}'\n"
                    f"fill='{color}' fill-opacity='0.5' stroke='{color}' "
                    f"stroke-opacity='0.9'\nstroke-width='0'>\n>"
                    f"\n<title>{title}</title>\n</polygon>\n")

        body = "".join(svg)
        return (
            "<?xml version='1.0' encoding='UTF-8' standalone='no' ?> "
            "<!DOCTYPE svg PUBLIC '-//W3C//DTD SVG 1.0//EN' "
            "'http://www.w3.org/TR/2001/REC-SVG-20010904/DTD/svg10.dtd'> "
            f"<svg version='1.0' width='{fmt(self.width + 25.0)}' "
            f"height='{fmt(self.height + 40.0)}' "
            "xmlns='http://www.w3.org/2000/svg' "
            f"xmlns:xlink='http://www.w3.org/1999/xlink'>{body}</svg>")
