"""Oracle (Python) vs native (C++) automaton equivalence, plus behavior
pinning on planted duplications."""

import numpy as np
import pytest

from asgart_tpu import automaton, native
from asgart_tpu.index import CODE, GenomeIndex
from asgart_tpu.pipeline import probe_positions, _pack_probe_kmers
from asgart_tpu.structs import RunSettings
from tests.util import plant_duplication, random_dna, revcomp


def run_oracle(text: bytes, needle: bytes, needle_offset: int,
               settings: RunSettings, idx: GenomeIndex):
    return automaton.search_duplications(
        needle, needle_offset, lambda pat: idx.search(pat), settings)


def run_native(text: bytes, needle: bytes, needle_offset: int,
               settings: RunSettings, idx: GenomeIndex):
    arr = np.frombuffer(needle, dtype=np.uint8)
    is_ = probe_positions(arr, settings.probe_size)
    if len(is_) == 0:
        return []
    codes = np.zeros(len(arr) + settings.probe_size, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    pk = _pack_probe_kmers(codes, is_, settings.probe_size)
    lo, hi = idx.lookup(pk)
    return native.chain(
        idx.sa, is_, lo, hi,
        probe_size=settings.probe_size,
        step_size=settings.probe_size // 2,
        max_gap_size=settings.max_gap_size,
        min_duplication_length=settings.min_duplication_length,
        max_cardinality=settings.max_cardinality,
        needle_offset=needle_offset,
        needle_len=len(arr),
        reverse=settings.reverse)


def small_settings(**kw) -> RunSettings:
    base = dict(probe_size=10, max_gap_size=30,
                min_duplication_length=100, max_cardinality=50)
    base.update(kw)
    return RunSettings(**base)


@pytest.mark.parametrize("seed", range(8))
def test_oracle_vs_native_fuzz_direct(seed):
    rng = np.random.default_rng(seed)
    n = 3000
    # low-complexity alphabet → many spurious matches → stress arm logic
    text = random_dna(rng, n, b"ACGT" if seed % 2 else b"ACG") + b"$"
    settings = small_settings()
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    needle = text[:-1]
    want = run_oracle(text, needle, 0, settings, idx)
    got = run_native(text, needle, 0, settings, idx)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_oracle_vs_native_fuzz_reverse(seed):
    rng = np.random.default_rng(100 + seed)
    n = 2500
    text = plant_duplication(rng, n, 400, 300, 1500,
                             noise=0.02, transform=revcomp) + b"$"
    settings = small_settings(reverse=True, complement=True)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")
    needle = text[:-1].translate(comp)[::-1]
    want = run_oracle(text, needle, 0, settings, idx)
    got = run_native(text, needle, 0, settings, idx)
    assert got == want


def test_planted_direct_duplication_found():
    rng = np.random.default_rng(5)
    text = plant_duplication(rng, 6000, 1500, 500, 3500, noise=0.01) + b"$"
    settings = RunSettings(probe_size=20, max_gap_size=120,
                           min_duplication_length=1000, max_cardinality=500)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    fams = run_native(text, text[:-1], 0, settings, idx)
    assert fams, "planted duplication not found"
    flat = [sd for fam in fams for sd in fam]
    # some duplicon must span the planted region
    best = max(flat, key=lambda sd: sd[3])
    left, right, llen, rlen = best
    assert abs(left - 500) < 200
    assert abs(right - 3500) < 200
    assert rlen > 1200


def test_interlaced_duplications_group_into_family():
    # two interlaced duplications that live and die together → one family
    rng = np.random.default_rng(11)
    n = 12000
    g = bytearray(random_dna(rng, n))
    # left spans overlap → both arms alive at once, die together (interlaced);
    # right copies are far apart so the arms cannot chain into one
    a = bytes(g[1000:2200])
    b = bytes(g[1500:2700])
    g[5000:6200] = a
    g[8000:9200] = b
    text = bytes(g) + b"$"
    settings = RunSettings(probe_size=20, max_gap_size=120,
                           min_duplication_length=1000, max_cardinality=500)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    fams = run_native(text, text[:-1], 0, settings, idx)
    assert fams
    sizes = sorted(len(f) for f in fams)
    assert max(sizes) >= 2, f"interlaced SDs were not grouped: {fams}"


def test_no_duplication_in_random_genome():
    rng = np.random.default_rng(17)
    text = random_dna(rng, 20000) + b"$"
    settings = RunSettings(probe_size=20, max_gap_size=120,
                           min_duplication_length=1000, max_cardinality=500)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    fams = run_native(text, text[:-1], 0, settings, idx)
    assert fams == []


def test_n_probes_are_skipped():
    rng = np.random.default_rng(23)
    g = bytearray(plant_duplication(rng, 5000, 1200, 200, 3000))
    g[250] = ord("N")  # lands on some probe starts
    text = bytes(g) + b"$"
    settings = RunSettings(probe_size=20, max_gap_size=120,
                           min_duplication_length=1000, max_cardinality=500)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    needle = text[:-1]
    want = run_oracle(text, needle, 0, settings, idx)
    got = run_native(text, needle, 0, settings, idx)
    assert got == want


def test_arm_prune_path_oracle_vs_native():
    """Force the 200-arm prune (automaton.rs:173-179): a 20-mer repeated
    hundreds of times spawns hundreds of arms per family."""
    rng = np.random.default_rng(31)
    unit = random_dna(rng, 40)
    # ~300 copies of a 40bp unit scattered through random background
    parts = []
    for _ in range(300):
        parts.append(random_dna(rng, int(rng.integers(50, 200))))
        parts.append(unit)
    text = b"".join(parts) + b"$"
    settings = RunSettings(probe_size=10, max_gap_size=40,
                           min_duplication_length=60, max_cardinality=400)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    needle = text[:-1]
    want = run_oracle(text, needle, 0, settings, idx)
    got = run_native(text, needle, 0, settings, idx)
    assert got == want
    # sanity: the scenario actually stressed the arm set
    assert sum(len(f) for f in want) > 0


def test_cardinality_skip_oracle_vs_native():
    """Probes over a massively repeated k-mer exceed max_cardinality and
    must be skipped without gap aging (automaton.rs:115-117)."""
    rng = np.random.default_rng(37)
    text = (random_dna(rng, 500) + b"A" * 2000 + random_dna(rng, 500)
            + b"A" * 1500 + random_dna(rng, 500)) + b"$"
    settings = RunSettings(probe_size=10, max_gap_size=40,
                           min_duplication_length=80, max_cardinality=20)
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    needle = text[:-1]
    want = run_oracle(text, needle, 0, settings, idx)
    got = run_native(text, needle, 0, settings, idx)
    assert got == want
