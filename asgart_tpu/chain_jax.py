"""On-device chaining: the arm automaton as a ``lax.scan``.

The reference automaton (``src/automaton.rs:57-204``) is sequential over
probes, but each probe step is internally data-parallel: every match is
classified against the *same* pre-step arm snapshot (the reference uses
``par_iter`` for exactly this reason, automaton.rs:122-134). The TPU
formulation keeps the sequential probe scan (``lax.scan``) and vectorizes
the per-step work:

  * classification is an [M, A] matrix of match×arm admissibility with a
    first-true argmin along arms (greedy first-arm assignment),
  * extensions reduce per arm with a last-match-wins max (the reference
    applies them in match order),
  * new arms are compacted into free slots with a prefix-sum scatter,
  * family emission on simultaneous death writes through a fixed-capacity
    output buffer.

Shapes are static: A arms, M matches per probe, OUT emitted duplicons.
The reference's dynamic arm vector is bounded in practice by its 200-arm
prune; A=256 reproduces it except in adversarial inputs (the native host
engine stays the byte-exact reference path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


class ChainConfig(NamedTuple):
    probe_size: int
    step_size: int
    max_gap_size: int
    min_duplication_length: int
    max_cardinality: int
    max_arms: int = 256
    max_matches: int = 512
    out_cap: int = 4096


def prepare_probe_stream_host(
    sa: np.ndarray, probe_is: np.ndarray, lo: np.ndarray, hi: np.ndarray,
    *, needle_offset: int, needle_len: int, reverse: bool,
    max_cardinality: int, max_matches: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact host preparation of the padded per-probe match stream.

    Returns (probe_is, matches [P, M] int32 padded with -1, valid [P]).
    Probes whose filtered match count exceeds ``max_cardinality`` are
    marked invalid (the automaton skips them entirely — no gap aging).
    """
    P = len(probe_is)
    M = max_matches
    matches = np.full((P, M), -1, dtype=np.int32)
    valid = np.ones(P, dtype=bool)
    for p in range(P):
        i = int(probe_is[p])
        ms = []
        for r in range(int(lo[p]), int(hi[p])):
            m_start = int(sa[r])
            if m_start == i:
                continue
            if not reverse:
                if not (m_start > i + needle_offset):
                    continue
            else:
                if not (m_start >= needle_offset + needle_len - i):
                    continue
            ms.append(m_start)
        if len(ms) > max_cardinality:
            valid[p] = False
            continue
        if len(ms) > M:
            raise ValueError(
                f"probe match count {len(ms)} exceeds max_matches={M}; "
                "ChainConfig.max_matches must be >= max_cardinality")
        matches[p, :len(ms)] = ms
    return probe_is.astype(np.int32), matches, valid


def _d_ss(a_start, a_end, m_start, m_end):
    """Segment distance (automaton.rs:207-216), vectorized."""
    inside = ((m_start >= a_start) & (m_start <= a_end)) | \
             ((m_end >= a_start) & (m_end <= a_end))
    d = jnp.minimum(jnp.abs(a_start - m_end), jnp.abs(a_end - m_start))
    return jnp.where(inside, 0, d)


@functools.partial(jax.jit, static_argnames=("cfg",))
def chain_scan(cfg: ChainConfig, probe_is: jax.Array, matches: jax.Array,
               valid: jax.Array):
    """Run the automaton over the probe stream.

    Returns (out [OUT, 5] int32: left, right, left_len, right_len,
    family_id; n_out scalar; n_families scalar; n_dropped scalar).
    Needle-relative left coordinates, like the reference automaton.

    Overflow protocol (mirrors the native chain's rc=1 retry contract):
    ``n_out`` keeps counting past ``out_cap`` — callers must treat
    ``n_out > out_cap`` as truncation and retry with a larger cap; and
    ``n_dropped`` counts new arms that found no free slot (arm-capacity
    overflow) — any nonzero value means families may be missing and the
    caller must retry with more ``max_arms``.
    """
    A, M, OUT = cfg.max_arms, cfg.max_matches, cfg.out_cap
    ps = I32(cfg.probe_size)
    step = I32(cfg.step_size)
    max_gap = I32(cfg.max_gap_size)
    min_dup = I32(cfg.min_duplication_length)

    class State(NamedTuple):
        l_start: jax.Array
        l_end: jax.Array
        r_start: jax.Array
        r_end: jax.Array
        gap: jax.Array
        active: jax.Array
        used: jax.Array
        out: jax.Array
        n_out: jax.Array
        n_fam: jax.Array
        n_dropped: jax.Array

    def empty_arms():
        z = jnp.zeros(A, dtype=I32)
        return z, z, z, z, z, jnp.zeros(A, bool), jnp.zeros(A, bool)

    def step_fn(st: State, inp):
        i, ms, ok = inp  # i scalar, ms [M], ok scalar
        m_valid = ms >= 0
        m_end = ms + ps

        # --- classification against the snapshot -------------------------
        l_len = st.l_end - st.l_start
        allow = jnp.maximum(max_gap,
                            (0.1 * l_len.astype(jnp.float32)).astype(I32))
        # [M, A] admissibility
        d = _d_ss(st.r_start[None, :], st.r_end[None, :],
                  ms[:, None], m_end[:, None])
        adm = (st.used & st.active)[None, :] & (d < allow[None, :]) & \
            (m_end[:, None] > st.r_end[None, :])
        arm_idx = jnp.arange(A, dtype=I32)[None, :]
        first = jnp.min(jnp.where(adm, arm_idx, A), axis=1)  # [M]
        extend = m_valid & (first < A)
        target = jnp.where(extend, first, A)  # A = no target

        # --- apply extensions (last match wins, match order) -------------
        match_idx = jnp.arange(M, dtype=I32)
        # for each arm: the largest match index targeting it
        hits = (target[:, None] == jnp.arange(A, dtype=I32)[None, :])  # [M,A]
        last = jnp.max(jnp.where(hits, match_idx[:, None], -1), axis=0)  # [A]
        dirty = last >= 0
        new_r_end = jnp.where(dirty, m_end[jnp.maximum(last, 0)], st.r_end)
        l_end = jnp.where(dirty, i + ps, st.l_end)
        r_end = new_r_end
        gap = jnp.where(dirty, 0, st.gap)

        # --- spawn new arms (match order, prefix-sum slots) --------------
        is_new = m_valid & ~extend
        n_used = jnp.sum(st.used).astype(I32)
        slot = n_used + jnp.cumsum(is_new.astype(I32)) - 1  # [M]
        n_dropped = st.n_dropped + jnp.sum(
            (is_new & (slot >= A)).astype(I32))
        slot = jnp.where(is_new & (slot < A), slot, A)  # drop on overflow
        l_start = st.l_start.at[slot].set(i, mode="drop")
        l_end = l_end.at[slot].set(i + ps, mode="drop")
        r_start = st.r_start.at[slot].set(ms, mode="drop")
        r_end = r_end.at[slot].set(m_end, mode="drop")
        gap = gap.at[slot].set(0, mode="drop")
        used = st.used.at[slot].set(True, mode="drop")
        active = st.active.at[slot].set(True, mode="drop")
        dirty = dirty.at[slot].set(False, mode="drop")

        # --- age non-dirty arms ------------------------------------------
        age = used & ~dirty
        gap = jnp.where(age, gap + step, gap)
        active = active & ~(age & (gap >= max_gap))

        # --- prune above 200 live arms (keep order via compaction) -------
        n_live = jnp.sum(used).astype(I32)
        keep_if_pruning = used & (
            active |
            ((l_end - l_start) >= min_dup) | ((r_end - r_start) >= min_dup))
        do_prune = n_live > 200
        keep = jnp.where(do_prune, keep_if_pruning, used)
        dest = jnp.cumsum(keep.astype(I32)) - 1
        dest = jnp.where(keep, dest, A)

        def compact(x, fill):
            return jnp.full(A, fill, x.dtype).at[dest].set(x, mode="drop")

        l_start = compact(l_start, 0)
        l_end = compact(l_end, 0)
        r_start = compact(r_start, 0)
        r_end = compact(r_end, 0)
        gap = compact(gap, 0)
        active = compact(active, False)
        used = compact(used, False)

        # --- simultaneous death → emit family ----------------------------
        any_used = jnp.any(used)
        all_dead = any_used & ~jnp.any(active & used)
        emit = used & ((r_end - r_start) >= min_dup) & all_dead
        any_emit = jnp.any(emit)
        rank = jnp.cumsum(emit.astype(I32)) - 1
        pos = jnp.where(emit, st.n_out + rank, OUT)
        out = st.out
        out = out.at[pos, 0].set(l_start, mode="drop")
        out = out.at[pos, 1].set(r_start, mode="drop")
        out = out.at[pos, 2].set(l_end - l_start, mode="drop")
        out = out.at[pos, 3].set(r_end - r_start, mode="drop")
        out = out.at[pos, 4].set(st.n_fam, mode="drop")
        n_out = st.n_out + jnp.sum(emit).astype(I32)
        n_fam = st.n_fam + any_emit.astype(I32)
        # reset arms after emission check
        cleared = jnp.zeros(A, bool)
        used = jnp.where(all_dead, cleared, used)
        active = jnp.where(all_dead, cleared, active)

        new_st = State(l_start, l_end, r_start, r_end, gap, active, used,
                       out, n_out, n_fam, n_dropped)
        # invalid probes (cardinality skip) are full no-ops
        merged = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_st, st)
        return merged, None

    ls, le, rs, re_, gp, act, used = empty_arms()
    init = State(ls, le, rs, re_, gp, act, used,
                 jnp.zeros((OUT, 5), dtype=I32), I32(0), I32(0), I32(0))
    final, _ = jax.lax.scan(step_fn, init,
                            (probe_is.astype(I32), matches, valid))
    return final.out, final.n_out, final.n_fam, final.n_dropped


def chain_device(
    cfg: ChainConfig, sa: np.ndarray, probe_is: np.ndarray,
    lo: np.ndarray, hi: np.ndarray, *, needle_offset: int, needle_len: int,
    reverse: bool,
) -> list[list[tuple[int, int, int, int]]]:
    """Host-convenient wrapper: exact host match prep + device scan →
    families in the native-engine format. Retries with doubled capacities
    on output/arm overflow (the native chain's rc=1 protocol)."""
    pis, matches, valid = prepare_probe_stream_host(
        sa, probe_is, lo, hi, needle_offset=needle_offset,
        needle_len=needle_len, reverse=reverse,
        max_cardinality=cfg.max_cardinality, max_matches=cfg.max_matches)
    while True:
        out, n_out, n_fam, n_dropped = chain_scan(
            cfg, jnp.asarray(pis), jnp.asarray(matches), jnp.asarray(valid))
        n_out = int(n_out)
        if n_out <= cfg.out_cap and int(n_dropped) == 0:
            break
        cfg = cfg._replace(
            out_cap=max(cfg.out_cap * 2, n_out + 1),
            max_arms=cfg.max_arms * (2 if int(n_dropped) else 1))
    out = np.asarray(out)[:n_out]
    families: list[list[tuple[int, int, int, int]]] = []
    for row in out:
        left, right, llen, rlen, fam = (int(x) for x in row)
        while len(families) <= fam:
            families.append([])
        families[fam].append((left, right, llen, rlen))
    return [f for f in families if f]
