import numpy as np

from asgart_tpu.json_io import F32, format_f32, to_string_pretty
from asgart_tpu.exporters import format_f32_display


def test_format_f32_basics():
    assert format_f32(0.0) == "0.0"
    assert format_f32(1.0) == "1.0"
    assert format_f32(100.0) == "100.0"
    assert format_f32(0.5) == "0.5"
    assert format_f32(-2.25) == "-2.25"


def test_format_f32_roundtrip_fuzz():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.uniform(0, 100, 2000).astype(np.float32),
        rng.uniform(-1e6, 1e6, 500).astype(np.float32),
        np.float32(100.0) * (1.0 - rng.integers(0, 1000, 500) /
                             rng.integers(1000, 2000, 500)).astype(np.float32),
    ])
    for v in vals:
        s = format_f32(float(v))
        assert np.float32(s) == v, (s, v)
        # fixed-notation values must have a decimal part
        if "e" not in s:
            assert "." in s


def test_format_f32_display():
    assert format_f32_display(0.0) == "0"
    assert format_f32_display(1.0) == "1"
    assert format_f32_display(98.5) == "98.5"
    assert format_f32_display(-3.0) == "-3"


def test_pretty_object():
    obj = {
        "name": "x y",
        "length": 12,
        "map": [{"name": "a", "position": 0, "length": 5}],
        "trim": None,
        "flag": True,
        "identity": F32(0.0),
        "empty": [],
    }
    expected = (
        '{\n'
        '  "name": "x y",\n'
        '  "length": 12,\n'
        '  "map": [\n'
        '    {\n'
        '      "name": "a",\n'
        '      "position": 0,\n'
        '      "length": 5\n'
        '    }\n'
        '  ],\n'
        '  "trim": null,\n'
        '  "flag": true,\n'
        '  "identity": 0.0,\n'
        '  "empty": []\n'
        '}'
    )
    assert to_string_pretty(obj) == expected


def test_pretty_nested_arrays():
    assert to_string_pretty([[1, 2], []]) == (
        '[\n  [\n    1,\n    2\n  ],\n  []\n]')


def test_string_escaping():
    assert to_string_pretty({"a\"b\\c\n": "é"}) == (
        '{\n  "a\\"b\\\\c\\n": "é"\n}')
