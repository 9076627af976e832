"""On-device (lax.scan) chaining vs the native engine, on the CPU backend."""

import numpy as np
import pytest

from asgart_tpu import native
from asgart_tpu.chain_jax import ChainConfig, chain_device
from asgart_tpu.index import CODE, GenomeIndex
from asgart_tpu.pipeline import _pack_probe_kmers, probe_positions
from asgart_tpu.structs import RunSettings
from tests.util import plant_duplication, random_dna, revcomp


def both_engines(text: bytes, needle: bytes, needle_offset: int,
                 settings: RunSettings):
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    arr = np.frombuffer(needle, dtype=np.uint8)
    is_ = probe_positions(arr, settings.probe_size)
    codes = np.zeros(len(arr) + settings.probe_size, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    pk = _pack_probe_kmers(codes, is_, settings.probe_size)
    lo, hi = idx.lookup(pk)

    kw = dict(
        probe_size=settings.probe_size,
        step_size=settings.probe_size // 2,
        max_gap_size=settings.max_gap_size,
        min_duplication_length=settings.min_duplication_length,
        max_cardinality=settings.max_cardinality)
    want = native.chain(
        idx.sa, is_, lo, hi, needle_offset=needle_offset,
        needle_len=len(arr), reverse=settings.reverse, **kw)
    cfg = ChainConfig(max_arms=256, max_matches=64, out_cap=1024, **kw)
    got = chain_device(
        cfg, idx.sa, is_, lo, hi, needle_offset=needle_offset,
        needle_len=len(arr), reverse=settings.reverse)
    return want, got


@pytest.mark.parametrize("seed", range(4))
def test_device_chain_matches_native_direct(seed):
    rng = np.random.default_rng(seed)
    text = random_dna(rng, 2500, b"ACGT" if seed % 2 else b"ACG") + b"$"
    settings = RunSettings(probe_size=10, max_gap_size=30,
                           min_duplication_length=100, max_cardinality=50)
    want, got = both_engines(text, text[:-1], 0, settings)
    assert got == want


def test_device_chain_matches_native_planted():
    rng = np.random.default_rng(77)
    text = plant_duplication(rng, 8000, 1500, 1000, 5000, noise=0.01) + b"$"
    settings = RunSettings()
    want, got = both_engines(text, text[:-1], 0, settings)
    assert got == want
    assert want  # the duplication is actually found


def test_device_chain_matches_native_reverse():
    rng = np.random.default_rng(5)
    text = plant_duplication(rng, 4000, 600, 500, 2500,
                             transform=revcomp) + b"$"
    settings = RunSettings(probe_size=10, max_gap_size=40,
                           min_duplication_length=300, max_cardinality=50,
                           reverse=True, complement=True)
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")
    needle = text[:-1].translate(comp)[::-1]
    want, got = both_engines(text, needle, 0, settings)
    assert got == want
    assert want
