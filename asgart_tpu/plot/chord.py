"""Chord (circular) plot (``src/plot/chord_plot.rs``)."""

from __future__ import annotations

import logging
import math
import random

from . import Settings, fmt, sep

R = 200.0
RING_WIDTH = 5.0
RING_MARGIN = 10.0
OUT_CEILING = R / 2.0
INTER_RING_SPACING = 0.002
TOTAL_WIDTH = 2.5 * (R + RING_MARGIN + RING_WIDTH + OUT_CEILING)
CX = TOTAL_WIDTH / 2.0
CY = TOTAL_WIDTH / 2.0

log = logging.getLogger("asgart-plot")


class ChordPlotter:
    def __init__(self, settings: Settings, result, colorizer, seed: int = 0):
        self.settings = settings
        self.result = result
        self.colorizer = colorizer
        self.length = float(result.strand.length)
        self.rng = random.Random(seed)

    def plot(self):
        out_filename = f"{self.settings.out_file}.svg"
        with open(out_filename, "w") as f:
            f.write(self.plot_chord())
        log.info("Chord plot written to `%s`", out_filename)

    def angle(self, x: float) -> float:
        return -x / self.length * 2.0 * math.pi

    def cartesian(self, t: float, r: float):
        return (CX + math.cos(t) * r, CY - math.sin(t) * r)

    def arc(self, radius: float, t1: float, t2: float) -> str:
        sx, sy = self.cartesian(t1, radius)
        ex, ey = self.cartesian(t2, radius)
        large = 1 if t2 - t1 > math.pi / 2.0 else 0
        sweep = 0 if t2 - t1 > 0.0 else 1
        return (f"M {fmt(sx)} {fmt(sy)} A {fmt(radius)} {fmt(radius)} 0 "
                f"{large} {sweep} {fmt(ex)} {fmt(ey)}")

    def plot_chord(self) -> str:
        svg = []
        svg.append("\n<g transform='translate(0, 0)' >\n")

        multi = len(self.result.strand.map) > 1
        for chr_ in self.result.strand.map:
            t1 = self.angle(chr_.position) - INTER_RING_SPACING
            t2 = self.angle(chr_.position + chr_.length) + INTER_RING_SPACING
            tt = t1 + (t2 - t1) / 2.0

            svg.append(
                f"<path d='{self.arc(R + RING_WIDTH, t1, t2)}' "
                f"stroke='{self.colorizer.color_fragment(chr_.name)}' "
                f"fill='none' stroke-width='5' />\n")
            if multi:
                svg.append(
                    f"<path d='{self.arc(R + RING_WIDTH + OUT_CEILING * 0.7, t1, t2)}' "
                    f"stroke='{self.colorizer.color_fragment(chr_.name)}' "
                    f"fill='none' stroke-width='1.5' />\n")

            r = R + RING_WIDTH + RING_MARGIN
            x, y = self.cartesian(tt, r + (65.0 if multi else 20.0))
            rot = -tt / (2.0 * math.pi) * 360.0 + 90.0
            label = chr_.name.replace("chr", "")
            svg.append(
                f"<text x='{fmt(x)}' y='{fmt(y)}' font-family='Helvetica' "
                f"font-size='8' fill='#333' "
                f"transform='rotate({fmt(rot)}, {fmt(x)}, {fmt(y)})'>\n"
                f"{label}\n</text>\n")

        for family in self.result.families:
            for sd in family:
                left = sd.global_left_position
                right = sd.global_right_position
                t11 = self.angle(left)
                t12 = self.angle(left + sd.left_length)
                t1 = t11 + (t12 - t11) / 2.0
                t21 = self.angle(right)
                t22 = self.angle(right + sd.right_length)
                t2 = t21 + (t22 - t21) / 2.0

                width = R * math.sqrt(2.0 * (1.0 - math.cos(t12 - t11)))
                if width <= self.settings.min_thickness:
                    width = self.settings.min_thickness
                color = self.colorizer.color(sd)

                if sd.chr_left != sd.chr_right or not multi:
                    x1, y1 = self.cartesian(t1, R)
                    x2, y2 = self.cartesian(t2, R)
                    cx, cy = CX, CY
                else:
                    tt = t1 + (t2 - t1) / 2.0
                    rin = R + RING_WIDTH + RING_MARGIN
                    rout = rin + OUT_CEILING
                    x1, y1 = self.cartesian(t1, rin)
                    cx, cy = self.cartesian(tt, rout)
                    x2, y2 = self.cartesian(t2, rin)

                path = (f"M {fmt(x1)},{fmt(y1)} Q {fmt(cx)},{fmt(cy)} "
                        f"{fmt(x2)} {fmt(y2)}")
                title = (
                    f"{sd.chr_left}: {sep(sd.chr_left_position)} → "
                    f"{sep(sd.chr_left_position + sd.left_length)}  "
                    f"({sep(sd.left_length)}bp)\n"
                    f"{sd.chr_right}: {sep(sd.chr_right_position)} → "
                    f"{sep(sd.chr_right_position + sd.right_length)} "
                    f"({sep(sd.right_length)}bp)")
                svg.append(
                    f"\n<path\nd='{path}' fill='none' stroke='{color}' "
                    f"stroke-opacity='0.3' stroke-width='{fmt(width)}' "
                    f"class='sd'>\n<title>{title}</title>\n</path>\n")

        from . import resolve_position
        for features_family in self.settings.feature_tracks:
            color = "#{:02X}{:02X}{:02X}".format(
                self.rng.randrange(256), self.rng.randrange(256),
                self.rng.randrange(256))
            for feature in features_family:
                for position in feature.positions:
                    start, length = resolve_position(self.result, position)
                    end = start + length
                    t1 = self.angle(start)
                    t2 = self.angle(end)
                    t0 = t1 + (t2 - t1) / 2.0
                    x0, y0 = self.cartesian(t0 - 0.02, R - 5.0)
                    x1, y1 = self.cartesian(t1, R)
                    x2, y2 = self.cartesian(t2, R)
                    x3, y3 = self.cartesian(t0 + 0.02, R - 5.0)
                    font_size = 4.0
                    svg.append(
                        f"<polygon points='{fmt(x0)},{fmt(y0)} "
                        f"{fmt(x1)},{fmt(y1)} {fmt(x2)},{fmt(y2)} "
                        f"{fmt(x3)},{fmt(y3)}' style='fill:{color};'/>\n")
                    rot = -t0 / (2.0 * math.pi) * 360.0
                    svg.append(
                        f"<text x='{fmt(x3 + font_size)}' "
                        f"y='{fmt(y3 + font_size)}' font-family='Helvetica' "
                        f"font-size='{fmt(font_size)}' "
                        f"transform='rotate({fmt(rot)}, {fmt(x3)}, "
                        f"{fmt(y3)})'>{feature.name}</text>")

        svg.append("</g>")
        body = "".join(svg)
        return (
            "<?xml version='1.0' encoding='UTF-8'  standalone='no' ?> "
            "<!DOCTYPE svg PUBLIC '-//W3C//DTD SVG 1.0//EN' "
            "'http://www.w3.org/TR/2001/REC-SVG-20010904/DTD/svg10.dtd'> "
            f"<svg version='1.0' width='{fmt(TOTAL_WIDTH)}' "
            f"height='{fmt(TOTAL_WIDTH)}' "
            "xmlns='http://www.w3.org/2000/svg' "
            "xmlns:xlink='http://www.w3.org/1999/xlink'> "
            "<style type='text/css'> .sd:hover { stroke-opacity: 1.0; "
            f"stroke: crimson; stroke-width: "
            f"{fmt(2.0 * self.settings.min_thickness)}; }} </style> "
            f"{body} </svg>")
