"""Targeted pins of the risky automaton semantics (CONFORMANCE.md).

These drive the chaining engines with hand-built probe streams so each
reference behavior (automaton.rs) is asserted explicitly, not just
incidentally via fuzz equality.
"""

import numpy as np
import pytest

from asgart_tpu import native
from asgart_tpu.chain_jax import ChainConfig, chain_device

K, STEP, MAX_GAP, MIN_DUP, CARD = 20, 10, 60, 20, 50


def make_stream(probes):
    """probes: list of (i, [match positions]) → (sa, is_, lo, hi)."""
    sa, is_, lo, hi = [], [], [], []
    for i, ms in probes:
        is_.append(i)
        lo.append(len(sa))
        sa.extend(ms)
        hi.append(len(sa))
    return (np.asarray(sa, dtype=np.int64), np.asarray(is_, dtype=np.int64),
            np.asarray(lo, dtype=np.int64), np.asarray(hi, dtype=np.int64))


def run_all_engines(probes, **kw):
    """native.chain, chain_device and chain_events must agree; returns
    the native result."""
    sa, is_, lo, hi = make_stream(probes)
    args = dict(probe_size=K, step_size=STEP, max_gap_size=MAX_GAP,
                min_duplication_length=MIN_DUP, max_cardinality=CARD)
    args.update(kw)
    needle_len = int(is_[-1]) + K + STEP + 1 if len(is_) else K + STEP + 1
    want = native.chain(sa, is_, lo, hi, needle_offset=0,
                        needle_len=needle_len, reverse=False, **args)
    cfg = ChainConfig(max_arms=64, max_matches=64, out_cap=256, **args)
    dev = chain_device(cfg, sa, is_, lo, hi, needle_offset=0,
                       needle_len=needle_len, reverse=False)
    assert dev == want
    # event form
    from tests.test_native import events_from_stream
    pe, zb, offs, flat, z_trail = events_from_stream(
        sa, is_, lo, hi, needle_offset=0, needle_len=needle_len,
        reverse=False, max_cardinality=args["max_cardinality"])
    ev = native.chain_events(pe, zb, offs, flat, z_trail=z_trail, **args)
    assert ev == want
    return want


def quiet(i0, n):
    return [(i0 + j * STEP, []) for j in range(n)]


def test_gap_aging_exact_boundary():
    """An arm deactivates when its gap reaches exactly max_gap (>=, not
    >, automaton.rs:168). With step=10 and max_gap=60, creation-step
    aging (gap=10) + 4 quiet steps leaves gap=50: still alive, so the
    next match extends. With 5 quiet steps the gap hits exactly 60: the
    arm is dead; the family is emitted and the match opens a NEW arm."""
    alive = [(10, [500])] + quiet(20, 4) + [(60, [510])] + quiet(70, 6)
    assert run_all_engines(alive) == [[(10, 500, 70, 30)]]

    dead = [(10, [500])] + quiet(20, 5) + [(70, [510])] + quiet(80, 6)
    # family 1 from the first arm; the new arm dies too and emits second
    assert run_all_engines(dead) == [[(10, 500, 20, 20)],
                                     [(70, 510, 20, 20)]]


def test_new_arm_ages_at_creation_step():
    """New arms are pushed non-dirty and age in the same step
    (automaton.rs:145-171): death after 5 further quiet steps, not 6."""
    probes = [(10, [500])] + quiet(20, 5) + [(70, [505])]
    out = run_all_engines(probes)
    # arm died exactly at the 5th quiet probe; 505 starts a new arm that
    # is dropped at end-of-needle
    assert out == [[(10, 500, 20, 20)]]


def test_probe_positions_bound():
    """i starts at step and stops when the previous i reaches
    len - k - step (pre-increment loop, automaton.rs:90-97)."""
    from asgart_tpu.pipeline import probe_positions

    a = np.frombuffer(b"A" * (K + STEP), dtype=np.uint8)
    assert probe_positions(a, K).tolist() == []
    b = np.frombuffer(b"A" * (K + STEP + 1), dtype=np.uint8)
    assert probe_positions(b, K).tolist() == [STEP]
    c = np.frombuffer(b"A" * (K + 3 * STEP + 1), dtype=np.uint8)
    assert probe_positions(c, K).tolist() == [STEP, 2 * STEP, 3 * STEP]


def test_tiny_needle_no_crash(tmp_path):
    """Chunks shorter than probe+step yield no families; the reference
    underflows its usize loop bound there (automaton.rs:96) and panics.
    Documented divergence #4."""
    from asgart_tpu.pipeline import search_duplications
    from asgart_tpu.structs import RunSettings
    from tests.util import write_fasta

    fa = tmp_path / "tiny.fa"
    write_fasta(fa, [("chr1", b"ACGTACGTACGTACGTACGTACGTA")])  # 25 bp
    res = search_duplications(
        [str(fa)], RunSettings(min_duplication_length=10))
    assert res.families == []


def test_skipped_probes_do_not_age():
    """Probes over max_cardinality are skipped whole with no gap aging
    (automaton.rs:115-117): an arm survives any number of them."""
    heavy = [2000 + 40 * j for j in range(CARD + 1)]  # 51 > max_cardinality
    probes = ([(10, [500])] +
              [(10 + j * STEP, heavy) for j in range(1, 30)] +  # 29 skips
              [(10 + 30 * STEP, [510])] + quiet(10 + 31 * STEP, 6))
    out = run_all_engines(probes)
    # the arm aged only in its creation step and in no skipped step, so
    # the match at i=310 still extends it
    assert out == [[(10, 500, 320, 30)]]


def test_interlaced_sds_one_family():
    """Interlaced arms that die together emit as ONE family, members in
    arm-creation order (automaton.rs:182-200)."""
    probes = [(10, [1000]), (20, [2000]), (30, [1010]), (40, [2010])]
    probes += quiet(50, 6)
    out = run_all_engines(probes)
    assert out == [[(10, 1000, 40, 30), (20, 2000, 40, 30)]]


def test_end_of_needle_drops_live_arms():
    """Arms still alive when the probe stream ends are dropped
    (loop exit, automaton.rs:96-201)."""
    probes = [(10, [500])] + quiet(20, 3)  # gap 40 < 60 at stream end
    assert run_all_engines(probes) == []


def test_family_emission_order():
    """Families appear in death order (push order into r)."""
    probes = ([(10, [500])] + quiet(20, 6) +
              [(100, [700])] + quiet(110, 6))
    out = run_all_engines(probes)
    assert out == [[(10, 500, 20, 20)], [(100, 700, 20, 20)]]


def test_filter_ns_f32_threshold():
    """Exactly 20% N (2 N in an 11-byte inclusive slice over length 10)
    is KEPT: the reference compares in f32 (asgart.rs:89)."""
    from asgart_tpu import postprocess
    from asgart_tpu.structs import ProtoSD

    strand = b"A" * 100 + b"NNAAAAAAAAA" + b"A" * 100
    sd = ProtoSD(left=100, right=150, left_length=10, right_length=10,
                 identity=0.0, reversed=False, complemented=False)
    for fn in (postprocess.filter_ns, postprocess.filter_ns_py):
        out = fn([[sd]], strand)
        assert out and out[0][0].left == 100
