"""Doubled-text PositionIndex: gather lookups must reproduce the
single-text searchsorted path exactly (match sets AND order)."""

import numpy as np
import pytest

from asgart_tpu import native
from asgart_tpu.index import CODE, GenomeIndex, PositionIndex
from asgart_tpu.pipeline import (_pack_probe_kmers, probe_positions,
                                 transform_needle)
from asgart_tpu.structs import RunSettings
from tests.util import plant_duplication, random_dna, revcomp


MODES = [(False, False), (True, False), (False, True), (True, True)]


@pytest.mark.parametrize("reverse,complement", MODES)
@pytest.mark.parametrize("seed", [0, 1])
def test_position_index_matches_search_path(seed, reverse, complement):
    rng = np.random.default_rng(seed)
    text = random_dna(rng, 3000, b"ACGTN" if seed else b"ACG") + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    k = 12
    n = len(data)

    gidx = GenomeIndex.build(data, k)
    pidx = PositionIndex.build(data, k, reverse=reverse,
                               complement=complement)

    # one chunk = whole genome
    needle = transform_needle(data[: n - 1], reverse, complement)
    is_ = probe_positions(needle, k)
    codes = np.zeros(len(needle) + k, dtype=np.uint8)
    codes[:len(needle)] = CODE[needle]
    pk = _pack_probe_kmers(codes, is_, k)

    lo_s, hi_s = gidx.lookup(pk)
    lo_t, hi_t = pidx.probe_ranges(0, n - 1, is_)

    for p in range(len(is_)):
        want = [int(m) for m in gidx.sa[lo_s[p]:hi_s[p]]]
        got = [int(m) for m in pidx.sa[lo_t[p]:hi_t[p]]
               if m < pidx.first_len - 1]
        assert got == want, f"probe {p} (i={is_[p]}) mismatch"


@pytest.mark.parametrize("reverse,complement", MODES)
def test_pipeline_families_equal_between_paths(tmp_path, reverse, complement):
    """Full chain output must be identical through both index paths."""
    rng = np.random.default_rng(7)
    transform = None
    if reverse and complement:
        transform = revcomp
    elif reverse:
        transform = lambda s: s[::-1]  # noqa: E731
    elif complement:
        comp = bytes.maketrans(b"ACGTN", b"TGCAN")
        transform = lambda s: s.translate(comp)  # noqa: E731
    text = plant_duplication(rng, 6000, 800, 700, 4000, noise=0.01,
                             transform=transform) + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    settings = RunSettings(probe_size=14, max_gap_size=60,
                           min_duplication_length=400, max_cardinality=100,
                           reverse=reverse, complement=complement)
    k = settings.probe_size
    n = len(data)

    needle = transform_needle(data[: n - 1], reverse, complement)
    is_ = probe_positions(needle, k)
    kw = dict(probe_size=k, step_size=k // 2,
              max_gap_size=settings.max_gap_size,
              min_duplication_length=settings.min_duplication_length,
              max_cardinality=settings.max_cardinality,
              needle_offset=0, needle_len=len(needle),
              reverse=reverse)

    gidx = GenomeIndex.build(data, k)
    codes = np.zeros(len(needle) + k, dtype=np.uint8)
    codes[:len(needle)] = CODE[needle]
    pk = _pack_probe_kmers(codes, is_, k)
    lo_s, hi_s = gidx.lookup(pk)
    want = native.chain(gidx.sa, is_, lo_s, hi_s, **kw)

    pidx = PositionIndex.build(data, k, reverse=reverse,
                               complement=complement)
    lo_t, hi_t = pidx.probe_ranges(0, n - 1, is_)
    got = native.chain(pidx.sa, is_, lo_t, hi_t,
                       max_match_pos=pidx.first_len - 1, **kw)
    assert got == want
    assert want, "fixture found nothing"


def test_pack_kmers_native_matches_python():
    rng = np.random.default_rng(3)
    text = random_dna(rng, 500, b"ACGTN") + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    codes = CODE[data]
    k = 20
    got = native.pack_kmers(codes, k)
    padded = np.zeros(len(codes) + k, dtype=np.uint8)
    padded[:len(codes)] = codes
    from asgart_tpu.index import pack_kmers_at
    want = pack_kmers_at(padded, np.arange(len(codes)), k)
    np.testing.assert_array_equal(got, want)


def test_group_tables_native_matches_numpy():
    rng = np.random.default_rng(4)
    text = random_dna(rng, 2000, b"ACG") + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    sa = native.suffix_array(data)
    kmers = native.pack_kmers(CODE[data], 8)
    lo, hi = native.group_tables(sa, kmers, n_threads=3)

    sa_k = kmers[sa]
    for r in range(len(sa)):
        want_lo = int(np.searchsorted(sa_k, sa_k[r], side="left"))
        want_hi = int(np.searchsorted(sa_k, sa_k[r], side="right"))
        p = int(sa[r])
        assert lo[p] == want_lo and hi[p] == want_hi
