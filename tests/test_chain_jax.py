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


@pytest.mark.parametrize("trial", range(6))
@pytest.mark.soak
def test_three_engine_equivalence_random_settings(trial):
    """Oracle ≡ native ≡ lax.scan under randomized settings and genomes."""
    from asgart_tpu import automaton

    rng = np.random.default_rng(1000 + trial)
    k = int(rng.choice([8, 10, 14, 20]))
    settings = RunSettings(
        probe_size=k,
        max_gap_size=int(rng.integers(k + 5, 120)),
        min_duplication_length=int(rng.integers(50, 400)),
        max_cardinality=int(rng.integers(10, 120)),
        reverse=bool(rng.integers(0, 2)))
    settings.complement = settings.reverse
    n = int(rng.integers(1500, 4000))
    alpha = [b"ACGT", b"ACG", b"ACGTN"][trial % 3]
    g = bytearray(random_dna(rng, n, alpha))
    # plant something findable
    L = int(rng.integers(200, 500))
    src = int(rng.integers(0, n // 2 - L))
    dst = int(rng.integers(n // 2, n - L))
    seg = bytes(g[src:src + L])
    if settings.reverse:
        seg = revcomp(seg)
    g[dst:dst + L] = seg
    text = bytes(g) + b"$"

    idx = GenomeIndex.build(np.frombuffer(text, dtype=np.uint8), k)
    needle = text[:-1]
    if settings.complement:
        needle = needle.translate(bytes.maketrans(b"ACGTN", b"TGCAN"))
    if settings.reverse:
        needle = needle[::-1]

    oracle = automaton.search_duplications(
        needle, 0, lambda pat: idx.search(pat), settings)
    want, got = both_engines(text, needle, 0, settings)
    assert want == oracle
    assert got == want


@pytest.mark.soak
def test_overflow_retry_out_cap_and_arms():
    """Drive chain_scan into its out_cap and max_arms overflow regimes:
    chain_device must detect the overflow (n_out > out_cap / n_dropped)
    and retry to the exact native result (VERDICT r1 weak #7)."""
    rng = np.random.default_rng(31)
    n = 12000
    g = bytearray(random_dna(rng, n, b"ACGT"))
    # one source copied to many destinations → every source probe matches
    # all copies, spawning many concurrent arms (arm-capacity pressure)
    # and emitting many duplicons (out-capacity pressure)
    L = 150
    src = 200
    for i in range(12):
        dst = 3000 + i * 400
        g[dst:dst + L] = bytes(g[src:src + L])
    text = bytes(g) + b"$"
    settings = RunSettings(probe_size=10, max_gap_size=30,
                           min_duplication_length=100, max_cardinality=80)

    idx = GenomeIndex.build(np.frombuffer(text, dtype=np.uint8),
                            settings.probe_size)
    arr = np.frombuffer(text[:-1], dtype=np.uint8)
    is_ = probe_positions(arr, settings.probe_size)
    codes = np.zeros(len(arr) + settings.probe_size, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    pk = _pack_probe_kmers(codes, is_, settings.probe_size)
    lo, hi = idx.lookup(pk)
    kw = dict(probe_size=settings.probe_size,
              step_size=settings.probe_size // 2,
              max_gap_size=settings.max_gap_size,
              min_duplication_length=settings.min_duplication_length,
              max_cardinality=settings.max_cardinality)
    want = native.chain(idx.sa, is_, lo, hi, needle_offset=0,
                        needle_len=len(arr), reverse=False, **kw)
    n_sds = sum(len(f) for f in want)
    assert n_sds > 4, "test genome must emit several duplicons"

    # tiny out_cap: forces the n_out > out_cap retry path
    cfg = ChainConfig(max_arms=256, max_matches=96, out_cap=2, **kw)
    got = chain_device(cfg, idx.sa, is_, lo, hi, needle_offset=0,
                       needle_len=len(arr), reverse=False)
    assert got == want

    # tiny max_arms: forces the dropped-arms retry path
    cfg = ChainConfig(max_arms=2, max_matches=96, out_cap=1024, **kw)
    got = chain_device(cfg, idx.sa, is_, lo, hi, needle_offset=0,
                       needle_len=len(arr), reverse=False)
    assert got == want


def test_chain_scan_reports_dropped_arms():
    """The raw scan must signal arm overflow instead of silently dropping."""
    import jax.numpy as jnp

    from asgart_tpu.chain_jax import chain_scan

    cfg = ChainConfig(probe_size=10, step_size=5, max_gap_size=30,
                      min_duplication_length=100, max_cardinality=50,
                      max_arms=2, max_matches=8, out_cap=16)
    # one probe spawning 4 distinct new arms: 2 fit, 2 dropped
    probe_is = jnp.asarray(np.array([5], dtype=np.int32))
    matches = np.full((1, 8), -1, dtype=np.int32)
    matches[0, :4] = [100, 300, 500, 700]
    valid = jnp.asarray(np.array([True]))
    out, n_out, n_fam, n_dropped = chain_scan(
        cfg, probe_is, jnp.asarray(matches), valid)
    assert int(n_dropped) == 2


@pytest.mark.parametrize("trial", range(8))
@pytest.mark.soak
def test_burst_chain_equals_event_chain(trial):
    """Full-on-device burst chaining (vmap over provably-independent
    bursts) must equal the native event-stream automaton, including
    in-burst quiet runs, trailing drops and multi-burst splits."""
    from asgart_tpu.chain_jax import chain_events_device
    from tests.test_native import events_from_stream

    rng = np.random.default_rng(7000 + trial)
    k = int(rng.choice([8, 10, 14]))
    settings = RunSettings(
        probe_size=k,
        max_gap_size=int(rng.integers(k + 5, 90)),
        min_duplication_length=int(rng.integers(60, 300)),
        max_cardinality=int(rng.integers(5, 60)))
    n = int(rng.integers(3000, 9000))
    g = bytearray(random_dna(rng, n, b"ACGT" if trial % 2 else b"ACG"))
    for _ in range(int(rng.integers(1, 6))):
        L = int(rng.integers(100, 500))
        src = int(rng.integers(0, n - 2 * L - 10))
        dst = int(rng.integers(src + L, n - L))
        g[dst:dst + L] = bytes(g[src:src + L])
    text = bytes(g) + b"$"

    idx = GenomeIndex.build(np.frombuffer(text, dtype=np.uint8), k)
    arr = np.frombuffer(text[:-1], dtype=np.uint8)
    is_ = probe_positions(arr, k)
    codes = np.zeros(len(arr) + k, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    pk = _pack_probe_kmers(codes, is_, k)
    lo, hi = idx.lookup(pk)
    kw = dict(probe_size=k, step_size=k // 2,
              max_gap_size=settings.max_gap_size,
              min_duplication_length=settings.min_duplication_length,
              max_cardinality=settings.max_cardinality)
    want = native.chain(idx.sa, is_, lo, hi, needle_offset=0,
                        needle_len=len(arr), reverse=False, **kw)
    pe, zb, offs, flat, z_trail = events_from_stream(
        idx.sa, is_, lo, hi, needle_offset=0, needle_len=len(arr),
        reverse=False, max_cardinality=settings.max_cardinality)
    cfg = ChainConfig(max_arms=256, max_matches=64, out_cap=256, **kw)
    got = chain_events_device(cfg, pe, zb, offs, flat, z_trail)
    assert got == want


@pytest.mark.soak
def test_burst_chain_capacity_retry():
    """Tiny per-lane out_cap / max_arms must retry to the exact result."""
    from asgart_tpu.chain_jax import chain_events_device
    from tests.test_native import events_from_stream

    rng = np.random.default_rng(41)
    n = 12000
    g = bytearray(random_dna(rng, n, b"ACGT"))
    L = 150
    for i in range(10):
        g[3000 + i * 400:3000 + i * 400 + L] = bytes(g[200:200 + L])
    text = bytes(g) + b"$"
    k = 10
    settings = dict(probe_size=k, step_size=k // 2, max_gap_size=30,
                    min_duplication_length=100, max_cardinality=80)
    idx = GenomeIndex.build(np.frombuffer(text, dtype=np.uint8), k)
    arr = np.frombuffer(text[:-1], dtype=np.uint8)
    is_ = probe_positions(arr, k)
    codes = np.zeros(len(arr) + k, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    pk = _pack_probe_kmers(codes, is_, k)
    lo, hi = idx.lookup(pk)
    want = native.chain(idx.sa, is_, lo, hi, needle_offset=0,
                        needle_len=len(arr), reverse=False, **settings)
    pe, zb, offs, flat, z_trail = events_from_stream(
        idx.sa, is_, lo, hi, needle_offset=0, needle_len=len(arr),
        reverse=False, max_cardinality=80)
    cfg = ChainConfig(max_arms=2, max_matches=96, out_cap=1, **settings)
    got = chain_events_device(cfg, pe, zb, offs, flat, z_trail)
    assert got == want
    assert sum(len(f) for f in want) > 4


def test_arm_slot_overflow_drops_then_retries_exactly():
    """> 256 live arms in one step (VERDICT r3 #9): a probe whose k-mer
    has more matches than free arm slots must (a) report the drop
    loudly via ``n_dropped`` on the raw scan, and (b) still produce the
    exact native result through ``chain_device``'s doubling retry —
    the reference's arm vector is unbounded within a step
    (automaton.rs:145-163; its 200-arm prune runs only between steps).
    """
    from asgart_tpu.chain_jax import chain_scan, prepare_probe_stream_host

    rng = np.random.default_rng(9)
    k = 10
    seed = b"ACGTACGGTA"
    unit, n_units = 50, 280  # 280 identical seeds > 256 arm slots
    g = bytearray()
    for _ in range(n_units):
        g += seed + random_dna(rng, unit - k, b"ACGT")
    text = bytes(g) + b"$"
    # gap must survive the 8 quiet probes between seeds (8*step = 40)
    settings = dict(probe_size=k, step_size=k // 2, max_gap_size=60,
                    min_duplication_length=300, max_cardinality=500)
    idx = GenomeIndex.build(np.frombuffer(text, dtype=np.uint8), k)
    arr = np.frombuffer(text[:-1], dtype=np.uint8)
    is_ = probe_positions(arr, k)
    codes = np.zeros(len(arr) + k, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    pk = _pack_probe_kmers(codes, is_, k)
    lo, hi = idx.lookup(pk)
    assert int((hi - lo).max()) >= n_units  # the seed k-mer group

    # (a) the raw scan at the default 256-slot capacity MUST report
    # dropped arms — silent divergence is the failure mode being pinned
    cfg = ChainConfig(max_arms=256, max_matches=512, out_cap=4096,
                      **settings)
    pis, matches, valid = prepare_probe_stream_host(
        idx.sa, is_, lo, hi, needle_offset=0, needle_len=len(arr),
        reverse=False, max_cardinality=500, max_matches=512)
    import jax.numpy as jnp
    _, _, _, n_dropped = chain_scan(cfg, jnp.asarray(pis),
                                    jnp.asarray(matches),
                                    jnp.asarray(valid))
    assert int(n_dropped) > 0

    # (b) the wrapper retries with doubled slots to the exact result
    want = native.chain(idx.sa, is_, lo, hi, needle_offset=0,
                        needle_len=len(arr), reverse=False, **settings)
    got = chain_device(cfg, idx.sa, is_, lo, hi, needle_offset=0,
                       needle_len=len(arr), reverse=False)
    assert got == want
    assert want  # the tandem array chains into real families
