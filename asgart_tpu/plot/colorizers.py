"""Duplicon colorizers (``src/plot/colorizers.rs``).

``FragmentColorizer`` uses a *seeded* shuffle — deterministic output, a
deliberate divergence from the reference's ``thread_rng``
(colorizers.rs:97).
"""

from __future__ import annotations

import colorsys
import random


def _hex(r: float, g: float, b: float) -> str:
    return "#{:02x}{:02x}{:02x}".format(
        int(r * 255.0) & 0xFF, int(g * 255.0) & 0xFF, int(b * 255.0) & 0xFF)


class TypeColorizer:
    """Direct vs reversed-or-complemented (colorizers.rs:13-45)."""

    def __init__(self, direct_color, rc_color):
        self.direct_color = direct_color
        self.rc_color = rc_color

    def color_fragment(self, name: str) -> str:
        return "#cccccc"

    def color(self, sd) -> str:
        c = self.direct_color if (not sd.reversed and not sd.complemented) \
            else self.rc_color
        return _hex(*c)


def _srgb_to_linear(c: float) -> float:
    if c <= 0.04045:
        return c / 12.92
    return ((c + 0.055) / 1.055) ** 2.4


def _linear_to_srgb(c: float) -> float:
    if c <= 0.0031308:
        return 12.92 * c
    return 1.055 * c ** (1.0 / 2.4) - 0.055


class PositionColorizer:
    """HSV gradient along the genome (colorizers.rs:47-81). The reference
    interpolates in HSV space between the HSV images of linear-RGB
    (1.0,0.1,0.1) and (0.1,1.0,1.0)."""

    def __init__(self, result):
        self.total_length = float(result.strand.length)
        self.h1, self.s1, self.v1 = _rgb_to_hsv(1.0, 0.1, 0.1)
        self.h2, self.s2, self.v2 = _rgb_to_hsv(0.1, 1.0, 1.0)

    def color_fragment(self, name: str) -> str:
        return "#cccccc"

    def color(self, sd) -> str:
        t = min(max(sd.global_left_position / self.total_length, 0.0), 1.0)
        h = self.h1 + (self.h2 - self.h1) * t
        s = self.s1 + (self.s2 - self.s1) * t
        v = self.v1 + (self.v2 - self.v1) * t
        r, g, b = colorsys.hsv_to_rgb((h % 360.0) / 360.0, s, v)
        # the reference converts linear→sRGB at output (Srgb::from_hsv on
        # a linear-RGB-derived HSV)
        return _hex(_linear_to_srgb(r), _linear_to_srgb(g), _linear_to_srgb(b))


def _rgb_to_hsv(r: float, g: float, b: float):
    h, s, v = colorsys.rgb_to_hsv(r, g, b)
    return (h * 360.0, s, v)


class FragmentColorizer:
    """One hue per fragment, seeded shuffle (colorizers.rs:83-140)."""

    def __init__(self, result, seed: int = 0):
        n = len(result.strand.map)
        colors = []
        for i in range(n):
            h = 30.0 + 330.0 * i / n if n else 0.0
            r, g, b = colorsys.hsv_to_rgb((h % 360.0) / 360.0, 1.0, 0.7)
            colors.append((r, g, b))
        random.Random(seed).shuffle(colors)
        names = [chr_.name for chr_ in result.strand.map]
        self.colors = dict(zip(names, colors))

    def color_fragment(self, name: str) -> str:
        c = self.colors[name]
        return _hex(c[0] / 1.3, c[1] / 1.3, c[2] / 1.3)

    def color(self, sd) -> str:
        return _hex(*self.colors[sd.chr_left])
