"""Exact host oracle of the gap-tolerant arm-extension automaton.

A direct, deliberately simple re-statement of the reference automaton
(``src/automaton.rs:57-216``) used as the correctness oracle for the fast
native and on-device chaining engines. Key semantics:

  * probes at ``i = step, 2*step, …`` while ``i < len - probe - step``
    (the first position 0 is never probed, automaton.rs:90-97),
  * probes whose first byte is ``N`` are skipped (no gap aging),
  * matches are filtered (self-hit, direction) and the probe is skipped
    when more than ``max_cardinality`` remain,
  * every match is classified against the same pre-step arm snapshot;
    extension = first active arm (in insertion order) whose right segment
    is within ``max(max_gap, 0.1·left_len)`` and which it would lengthen,
  * extensions apply in match order (last writer wins), then new arms
    append in match order; non-extended arms (including the new ones) age
    by ``step`` and die at ``max_gap``,
  * when every arm is dead, the long-enough ones are emitted together as
    one family ("simultaneous death"), and trailing arms at end-of-needle
    are discarded.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Arm:
    l_start: int
    l_end: int
    r_start: int
    r_end: int
    gap: int = 0
    active: bool = True
    dirty: bool = False


def d_ss(a_start: int, a_end: int, m_start: int, m_end: int) -> int:
    """Minimal distance between two segments (automaton.rs:207-216)."""
    if (a_start <= m_start <= a_end) or (a_start <= m_end <= a_end):
        return 0
    return min(abs(a_start - m_end), abs(a_end - m_start))


def search_duplications(
    needle: bytes,
    needle_offset: int,
    search,  # callable: pattern bytes -> list of absolute match starts (SA order)
    settings,
) -> list[list[tuple[int, int, int, int]]]:
    """Returns families of (left, right, left_length, right_length) with
    needle-relative left coordinates, exactly like the reference."""
    probe = settings.probe_size
    step = settings.probe_size // 2
    max_gap = settings.max_gap_size
    min_dup = settings.min_duplication_length

    arms: list[Arm] = []
    families: list[list[tuple[int, int, int, int]]] = []

    if len(needle) < settings.min_duplication_length:
        return []

    bound = len(needle) - probe - step
    i = 0
    while i < bound:
        i += step

        if needle[i] == ord("N"):
            continue

        matches = []
        for m_start in search(needle[i: i + probe]):
            if m_start == i:
                continue
            if not settings.reverse:
                if not (m_start > i + needle_offset):
                    continue
            else:
                if not (m_start >= needle_offset + len(needle) - i):
                    continue
            matches.append(m_start)
        if len(matches) > settings.max_cardinality:
            continue

        for a in arms:
            a.dirty = False

        # classification against the snapshot
        ops = []
        for m_start in matches:
            m_end = m_start + probe
            op = -1
            for j, a in enumerate(arms):
                if not a.active:
                    continue
                allow = max(max_gap, int(0.1 * (a.l_end - a.l_start)))
                if d_ss(a.r_start, a.r_end, m_start, m_end) < allow \
                        and m_end > a.r_end:
                    op = j
                    break
            ops.append(op)

        for m_start, op in zip(matches, ops):
            if op >= 0:
                a = arms[op]
                a.l_end = i + probe
                a.r_end = m_start + probe
                a.dirty = True
                a.gap = 0
        for m_start, op in zip(matches, ops):
            if op < 0:
                arms.append(Arm(i, i + probe, m_start, m_start + probe))

        for a in arms:
            if not a.dirty:
                a.gap += step
                if a.gap >= max_gap:
                    a.active = False

        if len(arms) > 200:
            arms = [a for a in arms
                    if a.active
                    or a.l_end - a.l_start >= min_dup
                    or a.r_end - a.r_start >= min_dup]

        if arms and all(not a.active for a in arms):
            family = [
                (a.l_start, a.r_start, a.l_end - a.l_start,
                 a.r_end - a.r_start)
                for a in arms if a.r_end - a.r_start >= min_dup
            ]
            if family:
                families.append(family)
            arms = []

    return families
