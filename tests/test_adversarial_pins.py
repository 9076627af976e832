"""Adversarial conformance corpus (VERDICT r3 #5).

The reference binary cannot run in this image, so the highest-risk
divergence areas are pinned by generated pathological inputs with all
engines byte-equal:

  1. trim-window boundary probes — duplication endpoints placed exactly
     at / off-by-one around the window edges, run through EVERY trim
     engine (host, device window, big-window, rank-sharded);
  2. masked + trim + multiFASTA interplay — soft-masked runs, IUPAC
     bytes, N runs crossing fragment and window boundaries, with
     --skip-masked on and off;
  3. family emission order under arm-prune pressure — tandem arrays
     driving >200 live arms so the reference's prune (automaton.rs:
     173-179) fires, all four chaining engines compared (Python oracle,
     native full-stream, native event-stream, lax.scan);
  4. reduce_overlap pathological fixpoints (asgart.rs:515-562) —
     subsegment chains, identical coordinates, merge cascades that need
     multiple fixpoint rounds, native vs the Python oracle.
"""

import copy
import io
import os

import numpy as np
import pytest

from asgart_tpu import native, postprocess
from asgart_tpu.exporters import JSONExporter
from asgart_tpu.pipeline import search_duplications
from asgart_tpu.structs import ProtoSD, RunSettings
from tests.util import random_dna, revcomp, write_fasta


def json_of(result) -> str:
    buf = io.StringIO()
    JSONExporter().save(result, buf)
    return buf.getvalue()


# --- 1. trim-window boundary probes ----------------------------------------


@pytest.mark.soak
@pytest.mark.parametrize("seed", range(3))
def test_trim_boundary_probes_all_trim_engines(tmp_path, seed):
    """Duplication arms ending exactly at, one before, and one after the
    window edges; windows cut through arms and through the k-mer tail.
    Host trim engine == device window == big-window == rank-sharded,
    full JSON bytes (finding 0 families when the right arm leaves the
    window is correct reference semantics — equality is what's pinned).
    """
    rng = np.random.default_rng(300 + seed)
    n = 30000
    k = 20
    g = bytearray(random_dna(rng, n, b"ACGT"))
    # arms around position 10000..12000 and 20000..22000
    g[20000:22000] = bytes(g[10000:12000])
    rc = revcomp(bytes(g[5000:6500]))
    g[15000:16500] = rc
    fa = tmp_path / "g.fa"
    write_fasta(fa, [("chr1", bytes(g))])

    # windows hitting the exact dup endpoints and k-mer-tail edges
    windows = [
        (10000, 22000),          # both arms exactly inside
        (10001, 21999),          # clips one bp off each arm
        (10000 - k, 22000 + k),  # k-mer slack around the arms
        (12000, 20000),          # left arm fully outside
        (0, 12000 - 1),          # right arm outside the window
        (9999, 22001 if 22001 <= n - 1 else n - 1),
    ]
    for win in windows:
        for kw in ({}, dict(reverse=True, complement=True)):
            s = RunSettings(min_duplication_length=800, trim=win, **kw)
            ref = json_of(search_duplications([str(fa)], s,
                                              engine="host"))
            got = json_of(search_duplications([str(fa)], s,
                                              engine="tpu"))
            assert got == ref, f"device window != host at trim={win}"
            os.environ["ASGART_BIG_WINDOW"] = "1"
            try:
                big = json_of(search_duplications([str(fa)], s,
                                                  engine="tpu"))
            finally:
                del os.environ["ASGART_BIG_WINDOW"]
            assert big == ref, f"big-window != host at trim={win}"
            os.environ["ASGART_RANK_SHARDED"] = "1"
            try:
                rsh = json_of(search_duplications([str(fa)], s,
                                                  engine="tpu"))
            finally:
                del os.environ["ASGART_RANK_SHARDED"]
            assert rsh == ref, f"rank-sharded != host at trim={win}"


# --- 2. masked + trim + multiFASTA interplay --------------------------------


@pytest.mark.soak
@pytest.mark.parametrize("seed", range(3))
def test_masked_trim_multifasta_interplay(tmp_path, seed):
    """Soft-masked (lowercase) runs, IUPAC ambiguity bytes, and N runs
    crossing fragment and trim boundaries; --skip-masked on/off; the
    trim window straddles a fragment boundary. Host == device JSON."""
    rng = np.random.default_rng(600 + seed)
    f1 = bytearray(random_dna(rng, 24000, b"ACGT"))
    f2 = bytearray(random_dna(rng, 16000, b"ACGT"))
    # duplication whose source is soft-masked in the middle
    f1[14000:16000] = bytes(f1[2000:4000])
    f1[2800:3200] = bytes(f1[2800:3200]).lower()
    # inter-fragment duplication crossing the masked run's shadow
    f2[6000:8000] = bytes(f1[13500:15500])
    # IUPAC bytes (map to N per prepare_data) sprinkled inside an arm
    for p in (14100, 14700, 15200):
        f1[p] = b"RYKMSWBDHV"[int(rng.integers(0, 10))]
    # N run >5000 straddling the f1/f2 boundary region of the trim
    f1[20000:24000] = b"N" * 4000
    f2[0:1500] = b"N" * 1500  # together: a 5500-N run across fragments
    fa = tmp_path / "g.fa"
    write_fasta(fa, [("chr1", bytes(f1)), ("chr2", bytes(f2))])

    for skip_masked in (False, True):
        for trim in (None, (1000, 30000), (23900, 39000)):
            for kw in ({}, dict(reverse=True, complement=True)):
                s = RunSettings(min_duplication_length=800, trim=trim,
                                skip_masked=skip_masked, **kw)
                ref = json_of(search_duplications([str(fa)], s,
                                                  engine="host"))
                got = json_of(search_duplications([str(fa)], s,
                                                  engine="tpu"))
                assert got == ref, (
                    f"masked/trim divergence at skip_masked="
                    f"{skip_masked} trim={trim} kw={kw}")


# --- 3. family emission order under arm-prune pressure ----------------------


def _oracle_stream(sa, is_, lo, hi, settings, needle_len):
    """Drive the Python oracle automaton with the same probe stream the
    other engines consume (its `search` callback is fed per-probe)."""
    from asgart_tpu import automaton

    by_i = {int(i): (int(a), int(b)) for i, a, b in zip(is_, lo, hi)}
    # needle content only matters for N-probe skips and probe length;
    # synthesize an N-free needle of the right length
    needle = b"A" * needle_len
    calls = {"j": 0}

    def search(pattern):
        i = int(is_[calls["j"]])
        calls["j"] += 1
        a, b = by_i[i]
        return [int(x) for x in sa[a:b]]

    return automaton.search_duplications(needle, 0, search, settings)


@pytest.mark.soak
@pytest.mark.parametrize("seed", range(4))
def test_prune_pressure_four_engines(seed):
    """Random bursty streams holding 150-400 live arms: the 200-arm
    prune (automaton.rs:173-179) fires repeatedly, and family EMISSION
    ORDER (which defines family grouping and JSON order) must agree
    across the oracle, native full-stream, native event-stream, and the
    lax.scan engine."""
    from asgart_tpu.chain_jax import ChainConfig, chain_device
    from tests.test_native import events_from_stream

    rng = np.random.default_rng(900 + seed)
    K, STEP = 20, 10
    settings = RunSettings(probe_size=K, max_gap_size=40,
                           min_duplication_length=60,
                           max_cardinality=500)
    sa, is_, lo, hi = [], [], [], []
    i = 0
    pos_base = 100000
    for burst in range(6):
        width = int(rng.integers(150, 400))  # live arms past the prune
        n_steps = int(rng.integers(3, 10))
        for _ in range(n_steps):
            i += STEP
            ms = sorted(pos_base + int(rng.integers(0, width)) * 900
                        + int(rng.integers(0, 60))
                        for _ in range(int(rng.integers(1, width))))
            is_.append(i)
            lo.append(len(sa))
            sa.extend(dict.fromkeys(ms))  # dedupe, keep order
            hi.append(len(sa))
        # quiet gap long enough to kill every arm -> family emission
        for _ in range(6):
            i += STEP
            is_.append(i)
            lo.append(len(sa))
            hi.append(len(sa))
        pos_base += 1_000_000
    sa = np.asarray(sa, dtype=np.int64)
    is_ = np.asarray(is_, dtype=np.int64)
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    needle_len = int(is_[-1]) + K + STEP

    kw = dict(probe_size=K, step_size=STEP,
              max_gap_size=settings.max_gap_size,
              min_duplication_length=settings.min_duplication_length,
              max_cardinality=settings.max_cardinality)
    want = native.chain(sa, is_, lo, hi, needle_offset=0,
                        needle_len=needle_len, reverse=False, **kw)
    assert sum(len(f) for f in want) > 50  # prune pressure produced SDs

    oracle = _oracle_stream(sa, is_, lo, hi, settings, needle_len)
    assert oracle == want

    pe, zb, offs, flat, z_trail = events_from_stream(
        sa, is_, lo, hi, needle_offset=0, needle_len=needle_len,
        reverse=False, max_cardinality=settings.max_cardinality)
    ev = native.chain_events(pe, zb, offs, flat, z_trail=z_trail, **kw)
    assert ev == want

    cfg = ChainConfig(max_arms=256, max_matches=512, out_cap=4096, **kw)
    dev = chain_device(cfg, sa, is_, lo, hi, needle_offset=0,
                       needle_len=needle_len, reverse=False)
    assert dev == want


# --- 4. reduce_overlap pathological fixpoints --------------------------------


def _as_tuples(fams):
    return [[(sd.left, sd.right, sd.left_length, sd.right_length)
             for sd in f] for f in fams]


def _fam(rows):
    return [ProtoSD(left=a, right=b, left_length=c, right_length=d,
                    identity=0.0, reversed=False, complemented=False)
            for (a, b, c, d) in rows]


@pytest.mark.soak
def test_reduce_overlap_pathological_fixpoints():
    """Shapes that stress the fixpoint loop (asgart.rs:515-562):
    subsegment chains that collapse pairwise per round, exact-duplicate
    coordinates, merge cascades where merging two SDs creates overlap
    with a third, and the left/right length-mixing quirk of merge()."""
    cases = [
        # nested subsegment chain: each is a subsegment of the next
        _fam([(100, 5000, 10 * (i + 1), 10 * (i + 1))
              for i in range(20)]),
        # exact duplicates
        _fam([(100, 200, 50, 50)] * 8),
        # merge cascade: adjacent overlapping windows, merging left to
        # right keeps creating new overlap with the next entry
        _fam([(100 + 30 * i, 9000 + 30 * i, 60, 60)
              for i in range(40)]),
        # length-mixing quirk bait: left/right lengths wildly different
        _fam([(100, 9000, 500, 20), (150, 9050, 20, 500),
              (200, 9100, 300, 300)]),
        # overlap on one axis only (overlap() needs both)
        _fam([(100, 9000, 200, 200), (150, 20000, 200, 200),
              (30000, 9050, 200, 200)]),
    ]
    want = postprocess.reduce_overlap_py(copy.deepcopy(cases))
    got = postprocess.reduce_overlap(copy.deepcopy(cases))
    assert _as_tuples(got) == _as_tuples(want)


@pytest.mark.soak
@pytest.mark.parametrize("seed", range(8))
def test_reduce_overlap_dense_random_fixpoints(seed):
    """Dense random interval clusters (tiny span, many members) force
    multi-round fixpoints; native must equal the Python oracle."""
    rng = np.random.default_rng(1200 + seed)
    fams = []
    for _ in range(25):
        m = int(rng.integers(2, 40))
        bl = int(rng.integers(0, 2000))
        br = int(rng.integers(5000, 7000))
        fams.append(_fam([
            (bl + int(rng.integers(0, 120)),
             br + int(rng.integers(0, 120)),
             int(rng.integers(1, 150)), int(rng.integers(1, 150)))
            for _ in range(m)]))
    want = postprocess.reduce_overlap_py(copy.deepcopy(fams))
    got = postprocess.reduce_overlap(copy.deepcopy(fams))
    assert _as_tuples(got) == _as_tuples(want)


# --- 5. round-5 corpus: masked chunk splits, degenerate FASTA, k routing ----


@pytest.mark.parametrize("seed", range(2))
def test_skip_masked_creates_chunk_split(tmp_path, seed):
    """A soft-masked (lowercase) run longer than the 5000-N chunking
    threshold splits the chunk list ONLY under --skip-masked (lowercase
    -> N makes it a splitting N run; unmasked it is plain sequence).
    Duplication arms sit on both sides of the run, so the two modes
    chunk differently AND chain differently. Host == device JSON in
    both modes, -RC included."""
    rng = np.random.default_rng(7100 + seed)
    g = bytearray(random_dna(rng, 40000, b"ACGT"))
    g[30000:32000] = bytes(g[4000:6000])            # direct pair
    g[33000:35000] = revcomp(bytes(g[7000:9000]))   # RC pair
    g[14000:20500] = bytes(g[14000:20500]).lower()  # 6500 > 5000 split
    fa = tmp_path / "g.fa"
    write_fasta(fa, [("chr1", bytes(g))])
    for skip_masked in (False, True):
        for kw in ({}, dict(reverse=True, complement=True)):
            s = RunSettings(min_duplication_length=800,
                            skip_masked=skip_masked, **kw)
            ref = json_of(search_duplications([str(fa)], s,
                                              engine="host"))
            got = json_of(search_duplications([str(fa)], s,
                                              engine="tpu"))
            assert got == ref, (skip_masked, kw)


def test_header_only_and_crlf_records(tmp_path):
    """Degenerate FASTA shapes the reference binary cannot arbitrate in
    this image (bio::io::fasta behaviors — CONFORMANCE 'unverifiable'
    list): header-only records (empty sequences), CRLF line endings,
    blank lines inside records, and a record that is ONLY IUPAC bytes.
    Pins OUR behavior: empty records keep zero-length strand-map
    entries, and host == device JSON."""
    rng = np.random.default_rng(7300)
    body = random_dna(rng, 12000, b"ACGT")
    dup = bytes(body[1000:2200])
    fa = tmp_path / "g.fa"
    with open(fa, "wb") as fh:
        fh.write(b">empty_lead\r\n")
        fh.write(b">chr1 with description\r\n")
        fh.write(bytes(body[:6000]) + b"\r\n\r\n")
        fh.write(bytes(body[6000:]) + b"\r\n")
        fh.write(b">iupac_only\r\nRYKMSWBDHVRYKMSWBDHV\r\n")
        fh.write(b">empty_mid\n")
        fh.write(b">chr2\n" + dup + b"ACGT" + dup + b"\n")
    s = RunSettings(min_duplication_length=800)
    ref = search_duplications([str(fa)], s, engine="host")
    names = [(f.name, f.length) for f in ref.strand.map]
    assert names == [("empty_lead", 0), ("chr1", 12000),
                     ("iupac_only", 20), ("empty_mid", 0),
                     ("chr2", 2 * len(dup) + 4)]
    got = json_of(search_duplications([str(fa)], s, engine="tpu"))
    assert got == json_of(ref)
    assert ref.families  # the chr2 tandem pair must be found


@pytest.mark.parametrize("k", [20, 21, 30, 31])
def test_k_routing_boundaries_under_shards(tmp_path, k):
    """Probe sizes at every device-routing boundary, THROUGH --shards:
    k=20 (2-plane windowed), 21 and 30 (3-plane fused windows), 31
    (beyond every device engine -> byte-equal host windows). All must
    match the host engine's sharded output exactly."""
    rng = np.random.default_rng(7500 + k)
    g = bytearray(random_dna(rng, 30000, b"ACGT"))
    g[20000:22000] = bytes(g[5000:7000])
    g[24000:25500] = revcomp(bytes(g[9000:10500]))
    fa = tmp_path / "g.fa"
    write_fasta(fa, [("chr1", bytes(g))])
    s = RunSettings(min_duplication_length=800, probe_size=k,
                    reverse=True, complement=True)
    ref = json_of(search_duplications([str(fa)], s, engine="host",
                                      shards=3))
    got = json_of(search_duplications([str(fa)], s, engine="tpu",
                                      shards=3))
    assert got == ref
