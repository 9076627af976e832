"""The TPU production engine: on-device index + scan, host event chain.

End-to-end chunk scan on the chip (reference hot loop being replaced:
automaton.rs:96-201 + searcher.rs:145-180):

  1. probe stream derived on device from the text codes (stride k/2,
     N-probe skip — automaton.rs:90-102);
  2. probe equal-ranges by one row-gather into the per-position tables of
     the doubled-text :class:`~asgart_tpu.device_index.DeviceIndex` — no
     per-probe search;
  3. flat CSR gather of all match windows, filtered exactly like the
     native chain (self hit, direction predicate, appended-half cutoff),
     per-probe kept counts, cardinality skip (automaton.rs:103-117);
  4. compaction to *events* (probes with >= 1 kept match) plus the
     intervening quiet-step counts — typically 50-500x smaller than the
     probe stream;
  5. events are downloaded (a few MB) and chained by the native
     event-stream automaton, which is fuzz-pinned equal to the full
     automaton. The sequential part of the algorithm is microseconds;
     everything bandwidth-heavy stayed on the chip.

A counts-only pre-pass sizes the flat gather capacity before the big
step is compiled, so repeat-dense genomes (Alu-like scatter) pick a
sufficient capacity in one shot instead of retry-recompiling.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import native
from .device_index import DeviceIndex

I32 = jnp.int32
log = logging.getLogger("asgart")

N_CODE = 4  # 3-bit rank of 'N'


def _bucket(n: int, lo: int = 1 << 16) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


@functools.partial(jax.jit, static_argnames=("k", "reverse", "complement",
                                             "b_pad"))
def _probe_tables(pos_lo_tab, pos_hi_tab, codes, chunk_start, chunk_len,
                  first_len,
                  k: int, reverse: bool, complement: bool, b_pad: int):
    """Probe positions, their table equal-ranges, and raw total.

    Returns (is_ [b_pad] needle-relative probe indices, mask [b_pad],
    lo, hi [b_pad], total_raw scalar).
    """
    step = k // 2
    j = jnp.arange(b_pad, dtype=I32)
    is_ = (j + 1) * step
    bound = chunk_len - k - step
    mask = (j * step) < bound  # (j+1-1)*step < bound, automaton.rs:90-97
    # N-probe skip checks the *needle* symbol at i; reverse flips the
    # position, complement maps N->N, so the original text code suffices
    q = jnp.where(jnp.asarray(reverse),
                  chunk_start + chunk_len - 1 - is_,
                  chunk_start + is_)
    qc = codes[jnp.clip(q, 0, codes.shape[0] - 1)]
    mask = mask & (qc != N_CODE)

    # table position of each probe's k-mer (index.PositionIndex
    # .probe_table_positions)
    if reverse:
        qq = chunk_start + chunk_len - is_ - k
        x = first_len + (first_len - 1 - qq - k)
    elif complement:
        x = first_len + chunk_start + is_
    else:
        x = chunk_start + is_
    x = jnp.clip(x, 0, pos_lo_tab.shape[0] - 1)
    lo = jnp.where(mask, pos_lo_tab[x], 0)
    hi = jnp.where(mask, pos_hi_tab[x], 0)
    # float64 is unavailable without x64 mode; a float32 sum is only used
    # to size the flat-gather capacity (the overflow retry is the exact
    # safety net), so pad for its 24-bit mantissa
    total_raw = jnp.sum((hi - lo).astype(jnp.float32))
    return is_, mask, lo, hi, total_raw


@functools.partial(jax.jit, static_argnames=("cap", "ev_cap", "reverse"))
def _scan_compact(sa, is_, mask, lo, hi, chunk_start, chunk_len,
                  max_match_pos, max_cardinality,
                  cap: int, ev_cap: int, reverse: bool):
    """CSR gather + exact filter + event compaction (device side).

    Returns (ev_pack [3, ev_cap]: probe_i / z_before / kept-count,
    m_flat [cap], scalars [4]: n_events, total_kept, z_trail, overflow).
    """
    B = is_.shape[0]
    counts_raw = (hi - lo).astype(I32)
    offsets = jnp.concatenate(
        [jnp.zeros(1, I32), jnp.cumsum(counts_raw).astype(I32)])
    starts = offsets[:-1]
    total_raw = offsets[-1]

    # flat CSR expansion: probe id per slot via boundary scatter + cumsum
    seg = jnp.zeros(cap + 1, I32).at[
        jnp.minimum(starts, cap)].add(1, mode="drop")
    probe_id = jnp.clip(jnp.cumsum(seg[:cap]) - 1, 0, B - 1)
    flat_pos = jnp.arange(cap, dtype=I32)
    within = flat_pos - starts[probe_id]
    flat_valid = (flat_pos < total_raw) & (within < counts_raw[probe_id])
    m = sa[jnp.clip(lo[probe_id] + within, 0, sa.shape[0] - 1)]

    i_of = is_[probe_id]
    if reverse:
        dir_ok = m >= chunk_start + chunk_len - i_of
    else:
        dir_ok = m > i_of + chunk_start
    keep = flat_valid & (m != i_of) & (m < max_match_pos) & dir_ok

    kept = jnp.zeros(B, I32).at[probe_id].add(
        keep.astype(I32), mode="drop")
    valid = mask & (kept <= max_cardinality)
    event = valid & (kept > 0)
    vz = valid & (kept == 0)

    # event compaction
    e_rank = jnp.cumsum(event.astype(I32)) - 1
    n_events = jnp.sum(event.astype(I32))
    dest = jnp.where(event & (e_rank < ev_cap), e_rank, ev_cap)
    A = jnp.cumsum(vz.astype(I32))
    z = jnp.zeros(ev_cap, I32)
    ev_probe = z.at[dest].set(is_, mode="drop")
    a_evt = z.at[dest].set(A, mode="drop")                     # A at event
    ev_count = z.at[dest].set(kept, mode="drop")
    # z_before[e] = A_evt[e] - A_evt[e-1] (A excludes the event itself)
    ev_z = jnp.concatenate([a_evt[:1], a_evt[1:] - a_evt[:-1]])
    ev_pack = jnp.stack([ev_probe, ev_z, ev_count])
    z_trail = (A[B - 1] if B > 0 else jnp.int32(0)) - jnp.where(
        n_events > 0, a_evt[jnp.maximum(n_events - 1, 0)], 0)

    # matches compaction in (probe, SA-slot) order; only event probes
    keep_f = keep & event[probe_id]
    kr = jnp.cumsum(keep_f.astype(I32)) - 1
    total_kept = jnp.sum(keep_f.astype(I32))
    m_flat = jnp.zeros(cap, I32).at[
        jnp.where(keep_f, kr, cap)].set(m, mode="drop")

    overflow = ((total_raw > cap) | (n_events > ev_cap)).astype(I32)
    scalars = jnp.stack([n_events, total_kept, z_trail, overflow])
    return ev_pack, m_flat, scalars


def _sharded_scan_compact(mesh, cap: int, ev_cap: int, reverse: bool,
                          axis: str = "probes"):
    """SPMD scan: index replicated over the mesh, probe slices sharded.

    Every device runs the identical `_scan_compact` on its contiguous
    probe slice; per-shard event streams come back stacked and the host
    concatenates them with an aging-carry fix (`_merge_shard_events`) —
    the subsequent global event chain is then *identical* to the
    single-device run: shard boundaries drop nothing.
    """
    from jax.sharding import PartitionSpec as P

    rep, shard = P(), P(axis)

    def step(sa, is_, mask, lo, hi, chunk_start, chunk_len,
             max_match_pos, max_cardinality):
        ev_pack, m_flat, scalars = _scan_compact(
            sa, is_, mask, lo, hi, chunk_start, chunk_len,
            max_match_pos, max_cardinality, cap, ev_cap, reverse)
        # per-shard trailing-aging totals for the host-side carry fix
        return ev_pack[None], m_flat[None], scalars[None]

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, shard, shard, shard, shard, rep, rep, rep, rep),
        out_specs=(shard, shard, shard),
        check_vma=False)
    return jax.jit(mapped)


def _merge_shard_events(shard_events):
    """Concatenate per-shard (probe_i, z_before, counts, m_flat, z_trail)
    into one global event stream.

    Aging carry: quiet probes trailing shard s (and whole quiet shards)
    prepend onto the first event of the next shard with events, exactly
    reproducing the unsharded stream's z_before sequence.
    """
    evs, ms = [], []
    carry = 0
    for (ev, m, z_trail) in shard_events:
        if ev.shape[1] > 0:
            ev = ev.copy()
            ev[1, 0] += carry
            evs.append(ev)
            ms.append(m)
            carry = z_trail
        else:
            carry += z_trail
    if not evs:
        return None, None, carry
    return np.concatenate(evs, axis=1), np.concatenate(ms), carry


class DeviceEngine:
    """On-device search over one prepared strand (the ``engine="tpu"``
    production path). With more than one visible device, the probe axis
    is sharded over a mesh (index replicated in every HBM)."""

    def __init__(self, strand, settings, profile: dict | None = None,
                 mesh=None):
        self.strand = strand
        self.settings = settings
        t0 = time.time()
        self.didx = DeviceIndex.build(
            strand.data, settings.probe_size,
            reverse=settings.reverse, complement=settings.complement)
        if mesh is None and len(jax.devices()) > 1:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()), ("probes",))
        self.mesh = mesh or None  # mesh=False forces the single-device path
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self.didx.sa = jax.device_put(self.didx.sa, rep)
            self.didx.pos_lo = jax.device_put(self.didx.pos_lo, rep)
            self.didx.pos_hi = jax.device_put(self.didx.pos_hi, rep)
            self.didx.codes = jax.device_put(self.didx.codes, rep)
        if profile is not None:
            profile["device_index_s"] = round(time.time() - t0, 3)

    def run_chunk(self, chunk: tuple[int, int]):
        """Families for one chunk, native-engine format + coordinate
        fixup left to the caller (mirrors SearchEngine.run_chunk)."""
        import os

        prof = os.environ.get("ASGART_DEVICE_PROFILE")
        t0 = time.time()

        def lap(what, *sync):
            nonlocal t0
            if not prof:
                return
            for x in sync:
                np.asarray(x.ravel()[:1])
            now = time.time()
            print(f"[dscan] {what}: {now - t0:.2f}s", flush=True)
            t0 = now

        s = self.settings
        start, length = chunk
        k = s.probe_size
        if length < s.min_duplication_length:
            return []
        step = k // 2
        bound = length - k - step
        if bound <= 0:
            return []
        n_probes = (bound + step - 1) // step
        b_pad = _bucket(n_probes)

        n_shards = self.mesh.devices.size if self.mesh is not None else 1
        if b_pad % n_shards:
            b_pad = ((b_pad + n_shards - 1) // n_shards) * n_shards

        didx = self.didx
        is_, mask, lo, hi, total_raw = _probe_tables(
            didx.pos_lo, didx.pos_hi, didx.codes, jnp.int32(start),
            jnp.int32(length), jnp.int32(didx.first_len), k, s.reverse,
            s.complement, b_pad)
        lap("probe tables", lo)
        total_raw = int(float(total_raw) * 1.001) + 8  # sync: sizes the gather
        lap(f"raw-total fetch ({total_raw})")

        cap = _bucket(max(total_raw + 1, 1 << 20))
        ev_cap = _bucket(min(cap, b_pad)) // 4
        while True:
            if self.mesh is None:
                ev_pack, m_flat, scalars = _scan_compact(
                    didx.sa, is_, mask, lo, hi, jnp.int32(start),
                    jnp.int32(length), jnp.int32(didx.first_len - 1),
                    jnp.int32(s.max_cardinality), cap, ev_cap, s.reverse)
                shards = [(ev_pack, m_flat, scalars)]
                lap(f"scan+compact (cap={cap})", ev_pack)
            else:
                step_fn = _sharded_scan_compact(
                    self.mesh, cap, ev_cap, s.reverse)
                evs, mfs, scs = step_fn(
                    didx.sa, is_, mask, lo, hi, jnp.int32(start),
                    jnp.int32(length), jnp.int32(didx.first_len - 1),
                    jnp.int32(s.max_cardinality))
                shards = [(evs[i], mfs[i], scs[i])
                          for i in range(n_shards)]
                lap(f"sharded scan+compact (cap={cap})", evs)

            parts = []
            overflow_any = False
            max_ev = 0
            for ev_pack, m_flat, scalars in shards:
                n_events, total_kept, z_trail, overflow = (
                    int(v) for v in np.asarray(scalars))
                overflow_any |= bool(overflow)
                max_ev = max(max_ev, n_events)
                parts.append((np.asarray(ev_pack[:, :n_events]),
                              np.asarray(m_flat[:total_kept]), z_trail))
            if not overflow_any:
                break
            if max_ev > ev_cap:
                ev_cap = _bucket(max_ev + 1)
            else:
                cap *= 2  # exact raw total exceeded the estimate
            log.debug("device scan retry: cap=%d ev_cap=%d", cap, ev_cap)

        lap("event download")
        ev, m_host, z_trail = _merge_shard_events(parts)
        if ev is None:
            return []
        n_events = ev.shape[1]
        m_offsets = np.zeros(n_events + 1, dtype=np.int64)
        np.cumsum(ev[2], out=m_offsets[1:])

        lap("merge")
        raw_families = native.chain_events(
            ev[0], ev[1], m_offsets, m_host,
            z_trail=z_trail,
            probe_size=k, step_size=step,
            max_gap_size=s.max_gap_size,
            min_duplication_length=s.min_duplication_length,
            max_cardinality=s.max_cardinality)
        lap("host event chain")
        return raw_families
