"""On-device suffix-array index construction.

TPU-native replacement of the host C++ index builder for the TPU engine
(reference analog: libdivsufsort's ``divsufsort64``, src/divsufsort.rs:10,
driven from asgart.rs:473-479). Motivation, measured on this rig
(scripts/tpu_probe.py): host->device transfers run at ~0.06 GB/s through
the axon tunnel, so shipping a prebuilt index (~12 B/bp) to the chip costs
tens of seconds — while ``jax.lax.sort`` sorts 128M two-plane keys in
~1 s. The only upload is therefore the 3-bit symbol codes (1 B/bp); the
doubled text (for R/C/RC runs), packed keys, suffix order and
per-position equal-range tables are all computed in HBM:

  1. **transform + pack**: the appended half (reverse / complement /
     reverse-complement of the genome) is computed on device; every
     position packs its next k symbols into two int32 planes (hi/lo 30
     bits), identical to :mod:`asgart_tpu.seed`'s packing.
  2. **initial sort**: one ``lax.sort`` over (key_hi, key_lo, position).
  3. **prefix doubling on the tied set**: positions whose k-mers collide
     (duplicated content) are compacted into a fixed-capacity slot list
     and refined by Manber-Myers rounds — sort the tied subset by
     (group, rank[p+h]), scatter back, recompute ranks — until every
     suffix rank is distinct. Each round is one device call; the tied
     set only shrinks. This reproduces the host builder's suffix order
     bit-exactly (asgart_native.cpp bpi_codes_impl).
  4. **tables**: per-position equal-range [lo, hi) over the k-mer groups
     (one row-gather per probe at scan time — no binary search).

Equality with the host ``PositionIndex`` is pinned by
tests/test_device_index.py on fuzzed genomes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .index import CODE, check_probe_size

I32 = jnp.int32
INT32_MAX = np.int32(2**31 - 1)

# 3-bit symbol rank complement: $->$, A<->T, C<->G, N->N
COMP_CODE = np.array([0, 5, 3, 2, 4, 1], dtype=np.uint8)

LO_SYMS = 10  # symbols in the low plane (30 bits)
# two int32 planes hold 20 symbols (10 each); k=21 would push 33 bits
# into the hi plane and silently merge distinct k-mer groups
DEVICE_MAX_K = 20


@functools.partial(jax.jit, static_argnames=("pad",))
def _pad_zeros(x: jax.Array, pad: int):
    return jnp.concatenate([x, jnp.zeros(pad, x.dtype)])


def _bucket_pow2(n: int) -> int:
    from .utils import pow2_ceil

    return pow2_ceil(n, 1)


@functools.partial(jax.jit, static_argnames=("k", "reverse", "complement",
                                             "pad_to"))
def _build_text_codes(codes: jax.Array, k: int, reverse: bool,
                      complement: bool, pad_to: int):
    """codes [n1] (genome + '$' ranks) → doubled/padded text codes
    [pad_to + k] with zero padding. The appended half is T(genome): the
    run transform applied on device (complement first, then reverse —
    pipeline.transform_needle order). (A nibble-packed upload was tried
    and reverted: the halved transfer lost more to the on-device unpack
    gather than it saved on the wire.)"""
    n1 = codes.shape[0]
    half = codes[: n1 - 1]
    if complement:
        half = jnp.asarray(COMP_CODE)[half]
    if reverse:
        half = half[::-1]
    if reverse or complement:
        text = jnp.concatenate([codes, half])
    else:
        text = codes
    out = jnp.zeros(pad_to + k, dtype=jnp.uint8)
    return out.at[: text.shape[0]].set(text)


@functools.partial(jax.jit, static_argnames=("k", "n"))
def _pack_planes_all(codes_padded: jax.Array, k: int, n: int):
    """(hi, lo) int32 planes of the k-mer at every position 0..n."""
    c = codes_padded.astype(I32)
    n_hi = max(k - LO_SYMS, 0)
    hi = jnp.zeros(n, dtype=I32)
    lo = jnp.zeros(n, dtype=I32)
    for j in range(n_hi):
        hi = (hi << 3) | jax.lax.dynamic_slice(c, (j,), (n,))
    for j in range(n_hi, k):
        lo = (lo << 3) | jax.lax.dynamic_slice(c, (j,), (n,))
    return hi, lo


@jax.jit
def _initial_sort(key_hi: jax.Array, key_lo: jax.Array):
    n = key_hi.shape[0]
    skhi, sklo, sa = jax.lax.sort(
        (key_hi, key_lo, jnp.arange(n, dtype=I32)), num_keys=2)
    return skhi, sklo, sa


@jax.jit
def _flagged_sort(key_hi: jax.Array, key_lo: jax.Array,
                  direct_bound: jax.Array):
    """Initial sort with the appended-half flag packed into the low
    plane's spare bit (keys use 30 of 31 value bits): within every
    k-mer group, first-half ("direct") positions sort before
    appended-half ones, so a group's direct entries form a contiguous
    prefix — the matchable window under the engine's
    ``m < first_len - 1`` restriction."""
    n = key_hi.shape[0]
    iota = jnp.arange(n, dtype=I32)
    flagged = (key_lo << 1) | (iota >= direct_bound).astype(I32)
    skhi, sklo, sa = jax.lax.sort((key_hi, flagged, iota), num_keys=2)
    return skhi, sklo, sa


@functools.partial(jax.jit, static_argnames=("flagged",))
def _groups_and_tables(skhi: jax.Array, sklo: jax.Array, sa: jax.Array,
                       direct_bound: jax.Array, flagged: bool = False):
    """Equal-key run boundaries over the sorted keys.

    Returns (rank [n] pos→run-start slot, pos_lo [n], pos_hi [n],
    tied_slot [n] bool).

    In ``flagged`` mode (doubled text, `sklo` carries the appended flag
    in bit 0), the per-position window [pos_lo, pos_hi) spans only the
    DIRECT entries of the position's k-mer group: pos_lo is the group
    (true-key) run start, pos_hi the direct/appended split point. The
    tied set is restricted to direct entries — appended-half suffix
    order is never observable (matches are filtered to the first half),
    and resolving direct ties never reads an appended rank: two tied
    direct suffixes agree on h symbols only while h <= their distance
    to the unique '$', so every rank[p+h] gather lands in the first
    half.

    The position-indexed outputs are produced by ONE payload sort keyed
    on `sa` (an inverse permutation): full-size random scatters run at
    ~25-50M elem/s on this rig (latency-bound HBM) while `lax.sort`
    moves 128M rows in ~1s, so sorting beats scattering ~4x here.
    """
    n = skhi.shape[0]
    iota = jnp.arange(n, dtype=I32)
    neq_full = jnp.concatenate([
        jnp.ones(1, bool),
        (skhi[1:] != skhi[:-1]) | (sklo[1:] != sklo[:-1])])
    run_lo_full = jax.lax.cummax(jnp.where(neq_full, iota, 0))
    nxt = jnp.concatenate([neq_full[1:], jnp.ones(1, bool)])
    if flagged:
        tk = sklo >> 1  # true (unflagged) low plane
        neq_true = jnp.concatenate([
            jnp.ones(1, bool),
            (skhi[1:] != skhi[:-1]) | (tk[1:] != tk[:-1])])
        run_lo = jax.lax.cummax(jnp.where(neq_true, iota, 0))
        direct = sa < direct_bound
        # every probe table read in doubled mode lands at an APPENDED
        # position (_probe_x0 maps all transforms past first_len), whose
        # window end is its own full-key run START (the direct/appended
        # split); direct positions get (lo, lo) — empty, never probed.
        # This also drops the reverse cummin run-end scan entirely.
        run_hi = jnp.where(direct, run_lo, run_lo_full)
        # tied (direct, full-key run len > 1): slot is not both a run
        # start and a run end — elementwise, no scan needed
        tied_slot = direct & ~(neq_full & nxt)
    else:
        run_lo = run_lo_full
        # run end: first boundary at or after i+1 (reverse min-scan)
        run_hi = jax.lax.cummin(jnp.where(nxt, iota + 1, n), reverse=True)
        tied_slot = (run_hi - run_lo) > 1
    _, lo_by_pos, hi_by_pos = jax.lax.sort(
        (sa, run_lo, run_hi), num_keys=1)
    # NB: tables stay as two 1-D arrays — a [n, 2] device array tiles as
    # (8, 128) on TPU, padding the minor dim 2 up to 128 (64x memory)
    rank = lo_by_pos
    return rank, lo_by_pos, hi_by_pos, tied_slot


@functools.partial(jax.jit, static_argnames=("cap",))
def _extract_tied(tied_slot: jax.Array, cap: int):
    """Compact the tied slot indices (ascending) into [cap]; returns
    (slots [cap] padded with n, count). Sort-based for the same
    scatter-vs-sort reason as `_groups_and_tables`."""
    n = tied_slot.shape[0]
    key = jnp.where(tied_slot, jnp.arange(n, dtype=I32), n)
    (sorted_keys,) = jax.lax.sort((key,), num_keys=1)
    return sorted_keys[:cap], jnp.sum(tied_slot.astype(I32))


@jax.jit
def _slot_payload(sa: jax.Array, rank: jax.Array, slots: jax.Array,
                  n_tied: jax.Array):
    """One-time (position, rank) gather for a fresh tied-slot list; the
    doubling rounds then carry both in slot space, saving two full-array
    latency-bound gathers per round."""
    cap = slots.shape[0]
    live = jnp.arange(cap, dtype=I32) < n_tied
    p = sa[jnp.where(live, slots, 0)]
    prim = jnp.where(live, rank[p], INT32_MAX)
    return jnp.where(live, p, 0), prim


@functools.partial(jax.jit, static_argnames=("rounds",))
def _doubling_rounds(sa: jax.Array, rank: jax.Array, slots: jax.Array,
                     ps: jax.Array, prims: jax.Array,
                     n_tied: jax.Array, h0: jax.Array, rounds: int):
    """`rounds` Manber-Myers refinement rounds on the tied subset.

    Tied slots hold positions whose suffixes agree on their first h
    symbols; each round sorts every tied group by rank[p+h] and refines
    ranks. The slot list stays ascending, so the j-th sorted element
    lands in the j-th tied slot of its group. The tied positions and
    their current ranks ride along in slot space (``ps``/``prims``,
    maintained by the round itself), so the only full-array gather per
    round is rank[p+h]; sa/rank scatters remain for the benefit of other
    groups' rank[p+h] reads and the final suffix order.
    """
    n = sa.shape[0]
    cap = slots.shape[0]
    jcap = jnp.arange(cap, dtype=I32)

    def one_round(carry, _):
        sa, rank, slots, ps, prims, n_tied, h = carry
        live = jcap < n_tied
        p = jnp.where(live, ps, 0)
        prim = jnp.where(live, prims, INT32_MAX)
        # p + h can overflow int32 near the 2^31 guard; n - h is always
        # in range (h is capped at ~n below), and the sum is only formed
        # when it provably fits
        in_text = p < (n - h)
        ph = jnp.where(in_text, p, 0) + jnp.where(in_text, h, 0)
        sec = jnp.where(live & in_text, rank[jnp.clip(ph, 0, n - 1)], -1)
        sp, ss, p_sorted = jax.lax.sort((prim, sec, p), num_keys=2)
        # scatter sorted positions back into the (ascending) slots
        dest = jnp.where(jcap < n_tied, slots, n)
        sa = sa.at[dest].set(p_sorted, mode="drop")
        # refined rank: start slot of each new (prim, sec) sub-run
        nb = jnp.concatenate([
            jnp.ones(1, bool),
            (sp[1:] != sp[:-1]) | (ss[1:] != ss[:-1])])
        rs = jax.lax.cummax(jnp.where(nb, dest, -1))
        rank = rank.at[jnp.where(jcap < n_tied, p_sorted, n)].set(
            rs, mode="drop")
        # still tied: sub-run length > 1
        nxt_same = jnp.concatenate([rs[1:] == rs[:-1], jnp.zeros(1, bool)])
        prv_same = jnp.concatenate([jnp.zeros(1, bool), rs[1:] == rs[:-1]])
        still = (nxt_same | prv_same) & (jcap < n_tied)
        # compact the still-tied entries to the front with ONE stable
        # partition sort (dest is ascending, so slot order is preserved);
        # three cap-sized random scatters were ~10x slower here
        new_n = jnp.sum(still.astype(I32))
        _, new_slots, new_ps, new_prims = jax.lax.sort(
            ((~still).astype(jnp.int8), dest, p_sorted, rs),
            num_keys=1, is_stable=True)
        dead = jcap >= new_n
        new_slots = jnp.where(dead, n, new_slots)
        new_ps = jnp.where(dead, 0, new_ps)
        new_prims = jnp.where(dead, INT32_MAX, new_prims)
        # h doubles but is capped near n (any two distinct suffixes
        # differ within n symbols), which also keeps it in int32
        h_next = jnp.minimum(h, jnp.int32((n - 1) // 2 + 1))
        return (sa, rank, new_slots, new_ps, new_prims, new_n,
                h_next + h_next), None

    (sa, rank, slots, ps, prims, n_tied, _), _ = jax.lax.scan(
        one_round, (sa, rank, slots, ps, prims, n_tied, h0), None,
        length=rounds)
    return sa, rank, slots, ps, prims, n_tied


@jax.jit
def _full_round(sa: jax.Array, rank: jax.Array, h: jax.Array,
                direct_bound: jax.Array):
    """Fallback full-array doubling round for hyper-repetitive inputs
    whose tied set exceeds the subset capacity. The appended-half flag
    rides as a sort key after the group rank, preserving each group's
    direct-entries-first layout; the tied set stays direct-only
    (``direct_bound = n`` makes both a no-op for unflagged builds)."""
    n = sa.shape[0]
    p = sa
    prim = rank[p]
    flagk = (p >= direct_bound).astype(I32)
    in_text = p < (n - h)
    ph = jnp.where(in_text, p, 0) + jnp.where(in_text, h, 0)
    sec = jnp.where(in_text, rank[jnp.clip(ph, 0, n - 1)], -1)
    sp, sf, ss, p_sorted = jax.lax.sort((prim, flagk, sec, p), num_keys=3)
    iota = jnp.arange(n, dtype=I32)
    nb = jnp.concatenate([
        jnp.ones(1, bool),
        (sp[1:] != sp[:-1]) | (sf[1:] != sf[:-1]) | (ss[1:] != ss[:-1])])
    rs = jax.lax.cummax(jnp.where(nb, iota, 0))
    _, rank = jax.lax.sort((p_sorted, rs), num_keys=1)  # inverse perm
    nxt_same = jnp.concatenate([rs[1:] == rs[:-1], jnp.zeros(1, bool)])
    prv_same = jnp.concatenate([jnp.zeros(1, bool), rs[1:] == rs[:-1]])
    tied_slot = (nxt_same | prv_same) & (p_sorted < direct_bound)
    return p_sorted, rank, tied_slot


def _resolve_ties(sa, rank, tied_slot, n: int, k: int,
                  rounds_per_call: int, tied_cap: int | None,
                  lap=lambda *a: None, direct_bound: int | None = None):
    """Host-driven doubling loop until every (direct) suffix rank is
    distinct (shared by the whole-genome and windowed builds):
    full-array rounds while the tied set exceeds the subset capacity,
    then subset rounds with a shrinking slot buffer."""
    if tied_cap is None:
        tied_cap = max(1024, n // 8)
    if direct_bound is None:
        direct_bound = n
    n_tied_host = int(jnp.sum(tied_slot.astype(I32)))
    h = k
    lap(f"tied count ({n_tied_host})")
    # hyper-repetitive input: full-array rounds until the tied set
    # fits the subset capacity
    while n_tied_host > tied_cap and h < 2 * n:
        sa, rank, tied_slot = _full_round(
            sa, rank, jnp.int32(min(h, n)), jnp.int32(direct_bound))
        h = min(h * 2, 2 * n)
        n_tied_host = int(jnp.sum(tied_slot.astype(I32)))
        lap(f"full round h={h//2} ({n_tied_host} tied)")
    # subset rounds, with the slot buffer sized to the live tied set
    # (scatter cost is per-lane whether live or dropped) and shrunk
    # as ties resolve; positions/ranks ride along in slot space
    if n_tied_host > 0:
        cap = max(1024, _bucket_pow2(n_tied_host))
        slots, n_tied = _extract_tied(tied_slot, cap)
        ps, prims = _slot_payload(sa, rank, slots, n_tied)
        while n_tied_host > 0 and h < 2 * n:
            # small tied sets are dispatch-latency-bound: batch more
            # rounds per device call once the buffer is compact (each
            # host sync is a relay round trip)
            if cap <= (1 << 17):
                rounds = max(rounds_per_call, 8)
            elif cap <= (1 << 20):
                rounds = max(rounds_per_call, 4)
            else:
                rounds = rounds_per_call
            sa, rank, slots, ps, prims, n_tied = _doubling_rounds(
                sa, rank, slots, ps, prims, n_tied, jnp.int32(min(h, n)),
                rounds)
            h = min(h << rounds, 2 * n)
            n_tied_host = int(n_tied)
            lap(f"rounds to h={h} cap={cap} ({n_tied_host} tied)")
            new_cap = max(1024, _bucket_pow2(n_tied_host))
            if n_tied_host and new_cap <= cap // 2:
                cap = new_cap
                slots = slots[:cap]
                ps = ps[:cap]
                prims = prims[:cap]
    return sa


@dataclass
class DeviceIndex:
    """Device-resident doubled-text position index (the on-device analog
    of :class:`asgart_tpu.index.PositionIndex`)."""

    sa: jax.Array        # [n] int32, suffix order over the (doubled) text
    pos_lo: jax.Array    # [n] int32 per-position range start
    pos_hi: jax.Array    # [n] int32 per-position range end
    codes: jax.Array     # [n + k] uint8 text codes, zero padded
    k: int
    n: int               # doubled text length
    first_len: int       # genome + '$' length
    reverse: bool
    complement: bool

    @staticmethod
    def upload_codes(strand_data: np.ndarray) -> jax.Array:
        """Start the (async) upload of the strand's symbol codes. A
        caller that knows the strand early — e.g. while input parsing or
        other host-side work is still running — can overlap the
        ~0.06 GB/s tunnel transfer and pass the handle to
        :meth:`build` via ``codes_device``."""
        return jax.device_put(CODE[strand_data])

    @classmethod
    def build(cls, strand_data: np.ndarray, k: int, reverse: bool = False,
              complement: bool = False, rounds_per_call: int = 2,
              tied_cap: int | None = None,
              codes_device: jax.Array | None = None) -> "DeviceIndex":
        """Build from the host strand bytes (genome + '$'). Only the
        symbol codes (1 B/bp) cross the host->device boundary
        (pre-uploadable via :meth:`upload_codes`)."""
        import os
        import time

        prof = os.environ.get("ASGART_DEVICE_PROFILE")
        t0 = time.time()

        def lap(what, *sync):
            nonlocal t0
            if not prof:
                return
            for x in sync:
                # a tiny fetch forces real completion (block_until_ready
                # returns early through the axon relay)
                np.asarray(x.ravel()[:1])
            now = time.time()
            print(f"[didx] {what}: {now - t0:.2f}s", flush=True)
            t0 = now

        check_probe_size(k)
        if k > DEVICE_MAX_K:
            raise ValueError(
                f"device index supports probe_size <= {DEVICE_MAX_K} "
                "(two int32 key planes); use the host engine")
        n1 = int(len(strand_data))
        n = 2 * n1 - 1 if (reverse or complement) else n1
        if n >= (1 << 31):
            raise ValueError(
                "device index shard too large for int32; shard the index")
        if codes_device is not None:
            codes1 = codes_device
        else:
            codes1 = jax.device_put(CODE[strand_data])  # the bulk upload
        lap("upload", codes1)

        from .device_engine import table_pad_for

        text_codes = _build_text_codes(
            codes1, k, reverse, complement, n + table_pad_for(k))
        lap("text", text_codes)
        key_hi, key_lo = _pack_planes_all(text_codes, k, n)
        lap("pack", key_hi)
        doubled = n != n1
        if doubled:
            # appended-half flag in the low plane's spare bit: windows
            # cover only matchable (first-half) entries and ties resolve
            # only among them (see _groups_and_tables)
            skhi, sklo, sa = _flagged_sort(key_hi, key_lo, jnp.int32(n1))
        else:
            skhi, sklo, sa = _initial_sort(key_hi, key_lo)
        lap("sort", sa)
        rank, pos_lo, pos_hi, tied_slot = _groups_and_tables(
            skhi, sklo, sa, jnp.int32(n1), flagged=doubled)
        # pad so the engine's strided probe-slice reads never clamp
        # (padded lanes read zero ranges, discarded by the probe mask)
        pad = table_pad_for(k)
        pos_lo = _pad_zeros(pos_lo, pad)
        pos_hi = _pad_zeros(pos_hi, pad)
        lap("groups+tables", rank, pos_hi)
        del key_hi, key_lo, skhi, sklo

        sa = _resolve_ties(sa, rank, tied_slot, n, k, rounds_per_call,
                           tied_cap, lap, direct_bound=n1)

        return cls(sa=sa, pos_lo=pos_lo, pos_hi=pos_hi, codes=text_codes,
                   k=k, n=n, first_len=n1, reverse=reverse,
                   complement=complement)

    def to_host_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(sa, ranges[n,2]) as numpy — test/diagnostic use only (bulk
        device->host downloads are slow on this rig)."""
        return (np.asarray(self.sa),
                np.stack([np.asarray(self.pos_lo[: self.n]),
                          np.asarray(self.pos_hi[: self.n])], axis=1))


@functools.partial(jax.jit, static_argnames=("w_text", "k"))
def _window_codes(codes1: jax.Array, win_start, w_text: int, k: int):
    """Symbol codes of the window text ``strand[ws:we] + '$'`` with k
    zero padding (the '$' rank and the padding are both 0, reproducing
    the host GenomeIndex's window-truncated packing)."""
    out = jnp.zeros(w_text + 1 + k, dtype=jnp.uint8)
    return out.at[:w_text].set(
        jax.lax.dynamic_slice(codes1, (win_start,), (w_text,)))


@jax.jit
def _slot_run_lo(skhi: jax.Array, sklo: jax.Array):
    """Slot-indexed equal-key run starts over the sorted keys (the
    lo-bound companion for merge-join lookups)."""
    n = skhi.shape[0]
    iota = jnp.arange(n, dtype=I32)
    neq = jnp.concatenate([
        jnp.ones(1, bool),
        (skhi[1:] != skhi[:-1]) | (sklo[1:] != sklo[:-1])])
    return jax.lax.cummax(jnp.where(neq, iota, 0))


def window_arrays_from_codes(win_codes: jax.Array, k: int, W: int,
                             rounds_per_call: int = 2,
                             tied_cap: int | None = None,
                             lap=lambda *a: None):
    """Index-side arrays for one window text of length ``W`` (incl. its
    '$') from already-device-resident window codes: (key_hi, key_lo,
    run_lo, sa_rel) — sorted two-plane keys, slot-indexed run starts,
    and the WINDOW-RELATIVE suffix order."""
    key_hi, key_lo = _pack_planes_all(win_codes, k, W)
    lap("pack", key_hi)
    skhi, sklo, sa = _initial_sort(key_hi, key_lo)
    rank, _, _, tied_slot = _groups_and_tables(skhi, sklo, sa,
                                               jnp.int32(W))
    run_lo = _slot_run_lo(skhi, sklo)
    lap("sort+groups", sa, run_lo)
    del key_hi, key_lo

    sa = _resolve_ties(sa, rank, tied_slot, W, k, rounds_per_call,
                       tied_cap, lap)
    return skhi, sklo, run_lo, sa


def build_window_arrays(codes1: jax.Array, k: int, ws: int, we: int,
                        rounds_per_call: int = 2,
                        tied_cap: int | None = None,
                        lap=lambda *a: None):
    """Index-side arrays for one trim window ``strand[ws:we] + '$'``:
    (key_hi, key_lo, run_lo, sa_global, W) — sorted two-plane keys,
    slot-indexed run starts, and the window suffix order with positions
    already globalized. Shared by :class:`DeviceWindowIndex` and the
    composed (windows x probes) mesh engine."""
    w_text = we - ws
    W = w_text + 1
    win_codes = _window_codes(codes1, jnp.int32(ws), w_text, k)
    skhi, sklo, run_lo, sa = window_arrays_from_codes(
        win_codes, k, W, rounds_per_call=rounds_per_call,
        tied_cap=tied_cap, lap=lap)
    return skhi, sklo, run_lo, sa + jnp.int32(ws), W


@dataclass
class DeviceWindowIndex:
    """Device-resident *windowed* index for ``--trim`` runs (reference
    trim semantics, asgart.rs:142-148: SA over the window only, the whole
    genome probed against it — the memory-bounded scale-out unit).

    Unlike :class:`DeviceIndex`, probe k-mers are not positions of the
    indexed text, so lookups are by value: the engine co-sorts probe keys
    with the window's sorted keys (a merge join — one ``lax.sort`` per
    probe batch instead of per-probe binary search, which would be
    latency-bound on random HBM gathers). Held device-side:

      * ``key_hi``/``key_lo`` [W]: sorted two-plane k-mer keys of every
        window position (aligned with ``sa`` — doubling permutes only
        within equal-key runs);
      * ``run_lo`` [W]: slot-indexed equal-run starts (lo bound lookup);
      * ``sa`` [W]: suffix order, positions already global;
      * ``codes``: the needle-addressable (doubled) genome codes used to
        pack probe keys by strided slices, shared layout with the
        whole-genome engine.
    """

    key_hi: jax.Array
    key_lo: jax.Array
    run_lo: jax.Array
    sa: jax.Array        # [W] int32 global positions, suffix order
    codes: jax.Array     # [n + pad] uint8 doubled text codes
    k: int
    n: int               # doubled text length (probe-addressable)
    first_len: int       # genome + '$' length
    W: int               # window text length incl. its own '$'
    win_start: int
    win_end: int
    reverse: bool
    complement: bool

    @classmethod
    def build(cls, strand_data: np.ndarray, k: int,
              trim: tuple[int, int], reverse: bool = False,
              complement: bool = False, rounds_per_call: int = 2,
              tied_cap: int | None = None,
              codes_device: jax.Array | None = None
              ) -> "DeviceWindowIndex":
        import os
        import time

        prof = os.environ.get("ASGART_DEVICE_PROFILE")
        t0 = time.time()

        def lap(what, *sync):
            nonlocal t0
            if not prof:
                return
            for x in sync:
                np.asarray(x.ravel()[:1])
            now = time.time()
            print(f"[widx] {what}: {now - t0:.2f}s", flush=True)
            t0 = now

        check_probe_size(k)
        if k > DEVICE_MAX_K:
            raise ValueError(
                f"device index supports probe_size <= {DEVICE_MAX_K} "
                "(two int32 key planes); use the host engine")
        ws, we = int(trim[0]), int(trim[1])
        n1 = int(len(strand_data))
        if not (0 <= ws < we <= n1 - 1):
            raise ValueError(f"bad trim window {trim}")
        n = 2 * n1 - 1 if (reverse or complement) else n1
        if n >= (1 << 31):
            raise ValueError(
                "genome too large for int32 probe addressing; "
                "use more trim windows per host")
        if codes_device is not None:
            codes1 = codes_device
        else:
            codes1 = jax.device_put(CODE[strand_data])
        lap("upload", codes1)

        from .device_engine import table_pad_for

        # probe-side: the needle-addressable doubled text (same layout
        # as the whole-genome engine; probes pack by strided slices)
        text_codes = _build_text_codes(
            codes1, k, reverse, complement, n + table_pad_for(k))
        skhi, sklo, run_lo, sa, W = build_window_arrays(
            codes1, k, ws, we, rounds_per_call=rounds_per_call,
            tied_cap=tied_cap, lap=lap)
        return cls(key_hi=skhi, key_lo=sklo, run_lo=run_lo, sa=sa,
                   codes=text_codes, k=k, n=n, first_len=n1, W=W,
                   win_start=ws, win_end=we, reverse=reverse,
                   complement=complement)
