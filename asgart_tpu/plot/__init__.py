"""Plotting toolchain: SVG mini-DOM, settings, feature tracks.

Mirrors the reference plot core (``src/plot/mod.rs``): ``Settings``,
``Feature``/``FeaturePosition``, and the retained-mode SVG primitives
(Line/Circle/Text with render/shift/scale/bbox/transpose) used by the
rosary plotter; the other plotters emit SVG strings directly.

Deliberate divergences from the reference (both documented in README):
  * random colors (features, fragment colorizer) come from a seeded RNG —
    deterministic output instead of ``thread_rng`` (colorizers.rs:97),
  * the Flat/Chord subcommand dispatch swap (asgart-plot.rs:507-508) is
    fixed: ``flat`` draws the flat plot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


def fmt(x: float) -> str:
    """Render a float the way Rust's ``{}`` does (shortest repr; integral
    values keep no trailing .0 for ints, but Rust prints f64 `5` as `5`)."""
    if isinstance(x, int):
        return str(x)
    v = float(x)
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def sep(n: int) -> str:
    """Thousands separation with spaces (the ``thousands`` crate)."""
    return f"{n:,}".replace(",", " ")


@dataclass
class Settings:
    out_file: str
    size: float = 200.0
    min_thickness: float = 0.1
    color1: str = "#ff5b00"
    color2: str = "#00b2ae"
    feature_tracks: list = field(default_factory=list)


@dataclass
class RelativePosition:
    chr: str
    start: int
    length: int


@dataclass
class AbsolutePosition:
    start: int
    length: int


FeaturePosition = Union[RelativePosition, AbsolutePosition]


@dataclass
class Feature:
    name: str
    positions: list


def resolve_position(result, position, with_length=True):
    """Relative → global coordinates via the fragment map."""
    if isinstance(position, RelativePosition):
        chr_ = result.strand.find_chr(position.chr)
        if chr_ is None:
            raise KeyError(f"Unable to find fragment `{position.chr}`")
        return (chr_.position + position.start, position.length)
    return (position.start, position.length)


# ---------------------------------------------------------------------------
# SVG mini-DOM (mod.rs:47-365)
# ---------------------------------------------------------------------------

@dataclass
class Line:
    x1: float
    y1: float
    x2: float
    y2: float
    stroke: Optional[str] = None
    stroke_width: float = 1.0
    hover: Optional[str] = None

    def render(self) -> str:
        style = f"stroke-width: {fmt(self.stroke_width)};"
        if self.stroke is not None:
            style += f"stroke: {self.stroke};"
        inner = (f"x1='{fmt(self.x1)}' y1='{fmt(self.y1)}' "
                 f"x2='{fmt(self.x2)}' y2='{fmt(self.y2)}'")
        inner += f" style='{style}'"
        if self.hover is not None:
            return f"<line {inner}><title>{self.hover}</title></line>"
        return f"<line {inner}/>"

    def shift(self, dx, dy):
        self.x1 += dx
        self.x2 += dx
        self.y1 += dy
        self.y2 += dy

    def scale(self, s):
        self.x1 *= s
        self.x2 *= s
        self.y1 *= s
        self.y2 *= s
        self.stroke_width *= s

    def dims(self):
        return (abs(self.x2 - self.x1), abs(self.y2 - self.y1))

    def bbox(self):
        x_min, x_max = sorted([self.x1, self.x2])
        y_min, y_max = sorted([self.y1, self.y2])
        hw = self.stroke_width / 2.0
        return (x_min - hw, y_min - hw, x_max + hw, y_max + hw)

    def transpose(self):
        self.x1, self.y1 = self.y1, self.x1
        self.x2, self.y2 = self.y2, self.x2


@dataclass
class Circle:
    cx: float
    cy: float
    r: float
    fill: str = "#000"

    def render(self) -> str:
        return (f"<circle cx='{fmt(self.cx)}' cy='{fmt(self.cy)}' "
                f"r='{fmt(self.r)}' fill='{self.fill}'/>")

    def shift(self, dx, dy):
        self.cx += dx
        self.cy += dy

    def scale(self, s):
        self.cx *= s
        self.cy *= s
        self.r *= s

    def dims(self):
        return (2.0 * self.r, 2.0 * self.r)

    def bbox(self):
        return (self.cx - self.r, self.cy - self.r,
                self.cx + self.r, self.cy + self.r)

    def transpose(self):
        self.cx, self.cy = self.cy, self.cx


@dataclass
class Text:
    x: float
    y: float
    text: str
    font_size: Optional[float] = None
    color: Optional[str] = None

    def render(self) -> str:
        return (f"<text x='{fmt(self.x)}' y='{fmt(self.y)}' "
                f"font-family='Helvetica' fill='{self.color or '#000'}' "
                f"font-size='{fmt(self.font_size or 10.0)}'>"
                f"{self.text}</text>")

    def shift(self, dx, dy):
        self.x += dx
        self.y += dy

    def scale(self, s):
        self.x *= s
        self.y *= s

    def dims(self):
        fs = self.font_size or 10.0
        return (fs * len(self.text), fs)

    def bbox(self):
        fs = self.font_size or 10.0
        return (self.x, self.y, self.x + fs * len(self.text), self.y + fs)

    def transpose(self):
        self.x, self.y = self.y, self.x


class SvgGroup:
    def __init__(self):
        self.content = []

    def push(self, o):
        self.content.append(o)
        return self

    def append(self, other: "SvgGroup"):
        self.content.extend(other.content)
        return self

    def render(self) -> str:
        return "\n".join(o.render() for o in self.content)

    def shift(self, dx, dy):
        for o in self.content:
            o.shift(dx, dy)
        return self

    def scale(self, s):
        for o in self.content:
            o.scale(s)
        return self

    def bbox(self):
        x1 = y1 = x2 = y2 = 0.0
        for o in self.content:
            bx1, by1, bx2, by2 = o.bbox()
            x1 = min(x1, bx1)
            y1 = min(y1, by1)
            x2 = max(x2, bx2)
            y2 = max(y2, by2)
        return (x1, y1, x2, y2)

    def dims(self):
        x1, y1, x2, y2 = self.bbox()
        return (x2 - x1, y2 - y1)

    def transpose(self):
        for o in self.content:
            o.transpose()
        return self
