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
import os
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
    """Pow2 buckets up to B_GRAN, then B_GRAN multiples (pow2 buckets
    waste up to 50% of the stream lanes at genome scale)."""
    b = lo
    while b < n and b < B_GRAN:
        b <<= 1
    while b < n:
        b += B_GRAN
    return b


# probe-count bucket granularity: coarse enough to bound recompiles,
# fine enough not to waste stream lanes (old pow2 buckets wasted ~30%)
B_GRAN = 1 << 20


def table_pad_for(k: int) -> int:
    """Table padding so the strided probe-slice reads of `_scan_chunk`
    never clamp for lanes holding real probes (bucket slack is at most
    B_GRAN + shard-divisibility roundup)."""
    return (B_GRAN + 1024) * (k // 2) + k


def _probe_x0(chunk_start, chunk_len, first_len, k: int, reverse: bool,
              complement: bool):
    """Table position of probe j=0 (i = step); x is affine increasing in
    j for every transform: x = x0 + j*step (PositionIndex
    .probe_table_positions algebra)."""
    step = k // 2
    if reverse:
        # x = n1 + (n1 - 1 - (start + len - i - k) - k) = const + i
        return 2 * first_len - 1 - chunk_start - chunk_len + step
    if complement:
        return first_len + chunk_start + step
    return chunk_start + step


@functools.partial(jax.jit, static_argnames=("k", "reverse", "complement",
                                             "b_pad"))
def _raw_total(pos_lo_tab, pos_hi_tab, chunk_start, chunk_len,
               first_len, k: int, reverse: bool, complement: bool,
               b_pad: int):
    """Cheap pre-pass: the summed raw window size, to size the flat
    gather before the big step is compiled."""
    step = k // 2
    x0 = _probe_x0(chunk_start, chunk_len, first_len, k, reverse,
                   complement)
    lo = jax.lax.dynamic_slice(pos_lo_tab, (x0,),
                               (b_pad * step,))[::step]
    hi = jax.lax.dynamic_slice(pos_hi_tab, (x0,),
                               (b_pad * step,))[::step]
    j = jnp.arange(b_pad, dtype=I32)
    bound = chunk_len - k - step
    mask = (j * step) < bound
    # N-probe mask is not needed for an upper bound
    total = jnp.sum(jnp.where(mask, hi - lo, 0).astype(jnp.float32))
    return total


@functools.partial(jax.jit, static_argnames=("k", "reverse",
                                             "complement", "b_pad"))
def _raw_totals_batch(pos_lo_tab, pos_hi_tab, chunk_params,
                      first_len, k: int, reverse: bool, complement: bool,
                      b_pad: int):
    """`_raw_total` over [C, 2] (start, len) chunk params in one
    dispatch (each pre-pass round trip costs ~0.3 s on this rig)."""

    def one(p):
        return _raw_total(pos_lo_tab, pos_hi_tab, p[0], p[1],
                          first_len, k, reverse, complement, b_pad)

    return jax.lax.map(one, chunk_params)


@functools.partial(jax.jit, static_argnames=(
    "k", "reverse", "complement", "b_pad", "cap", "ev_cap"))
def _scan_chunk(pos_lo_tab, pos_hi_tab, codes, sa,
                chunk_start, chunk_len, first_len, max_match_pos,
                max_cardinality, j0,
                k: int, reverse: bool, complement: bool,
                b_pad: int, cap: int, ev_cap: int):
    """Fused device scan for one probe slice [j0, j0 + b_pad):
    probe stream -> table equal-ranges (strided slices) -> flat CSR
    match gather -> exact filters -> per-probe cardinality -> event
    compaction (sort-based: full-size drop-scatters are latency-bound
    on this rig, a payload sort is ~3x cheaper).

    Returns (ev_pack [3, ev_cap], m_flat [cap], scalars [4]).
    """
    step = k // 2
    jl = jnp.arange(b_pad, dtype=I32)
    j = j0 + jl
    bound = chunk_len - k - step
    mask = (j * step) < bound  # pre-increment loop, automaton.rs:90-97

    # equal-ranges by strided slice (x affine increasing in j; tables are
    # padded by table_pad_for(k) so the slice never clamps)
    x0 = _probe_x0(chunk_start, chunk_len, first_len, k, reverse,
                   complement) + j0 * step
    lo = jax.lax.dynamic_slice(pos_lo_tab, (x0,), (b_pad * step,))[::step]
    hi = jax.lax.dynamic_slice(pos_hi_tab, (x0,), (b_pad * step,))[::step]
    # N-probe skip (automaton.rs:100-102): the probe window at needle i
    # equals the text window at x by doubled-text construction, so the
    # needle symbol check is the same strided slice over the codes
    cx = jax.lax.dynamic_slice(codes, (x0,), (b_pad * step,))[::step]
    mask = mask & (cx != N_CODE)
    lo = jnp.where(mask, lo, 0)
    hi = jnp.where(mask, hi, 0)

    counts_raw = hi - lo
    ck = jnp.cumsum(counts_raw)
    starts = ck - counts_raw
    total_raw = ck[b_pad - 1] if b_pad > 0 else jnp.int32(0)

    # flat CSR expansion; probe id via boundary scatter + cumsum, the
    # segment start position via cummax (no per-slot gathers needed)
    seg = jnp.zeros(cap + 1, I32).at[
        jnp.minimum(starts, cap)].add(1, mode="drop")
    probe_id = jnp.clip(jnp.cumsum(seg[:cap]) - 1, 0, b_pad - 1)
    flat_pos = jnp.arange(cap, dtype=I32)
    seg_start = jax.lax.cummax(
        jnp.where(seg[:cap] > 0, flat_pos, 0))
    within = flat_pos - seg_start
    flat_valid = flat_pos < jnp.minimum(total_raw, cap)
    m = sa[jnp.clip(lo[probe_id] + within, 0, sa.shape[0] - 1)]

    i_of = (j0 + probe_id + 1) * step  # = is_[probe_id], no gather
    if reverse:
        dir_ok = m >= chunk_start + chunk_len - i_of
    else:
        dir_ok = m > i_of + chunk_start
    keep = flat_valid & (m != i_of) & (m < max_match_pos) & dir_ok

    kept = jnp.zeros(b_pad, I32).at[probe_id].add(
        keep.astype(I32), mode="drop")
    valid = mask & (kept <= max_cardinality)
    event = valid & (kept > 0)
    vz = valid & (kept == 0)

    # event compaction by sort: key pushes non-events to the back
    n_events = jnp.sum(event.astype(I32))
    A = jnp.cumsum(vz.astype(I32))
    ekey = jnp.where(event, jl, b_pad)
    sk, a_evt, ev_count = jax.lax.sort((ekey, A, kept), num_keys=1)
    # the sorted key IS the probe lane: recompute is_ instead of
    # carrying a fourth sort payload
    ev_probe = (j0 + sk[:ev_cap] + 1) * step
    a_evt = a_evt[:ev_cap]
    ev_count = ev_count[:ev_cap]
    # z_before[e] = A_evt[e] - A_evt[e-1] (A excludes the event itself)
    ev_z = jnp.concatenate([a_evt[:1], a_evt[1:] - a_evt[:-1]])
    ev_pack = jnp.stack([ev_probe, ev_z, ev_count])
    z_trail = A[b_pad - 1] - jnp.where(
        n_events > 0, a_evt[jnp.clip(n_events - 1, 0, ev_cap - 1)], 0)

    # matches compaction in (probe, SA-slot) order, event probes only
    keep_f = keep & event[probe_id]
    total_kept = jnp.sum(keep_f.astype(I32))
    mkey = jnp.where(keep_f, flat_pos, cap)
    _, m_flat = jax.lax.sort((mkey, m), num_keys=1)

    overflow = ((total_raw > cap) | (n_events > ev_cap)).astype(I32)
    scalars = jnp.stack([n_events, total_kept, z_trail, overflow])
    return ev_pack, m_flat, scalars


def _sharded_scan(mesh, k: int, reverse: bool, complement: bool,
                  b_local: int, cap: int, ev_cap: int,
                  axis: str = "probes"):
    """SPMD scan: index replicated over the mesh; every device runs the
    fused `_scan_chunk` on its own probe slice (j0 from its axis index —
    no sharded inputs at all). Per-shard event streams come back stacked
    and the host concatenates them with an aging-carry fix
    (`_merge_shard_events`) — the subsequent global event chain is then
    *identical* to the single-device run: shard boundaries drop nothing.
    """
    from jax.sharding import PartitionSpec as P

    def stepf(pos_lo_tab, pos_hi_tab, codes, sa, chunk_start, chunk_len,
              first_len, max_match_pos, max_cardinality):
        d = jax.lax.axis_index(axis).astype(I32)
        j0 = d * b_local
        ev_pack, m_flat, scalars = _scan_chunk(
            pos_lo_tab, pos_hi_tab, codes, sa, chunk_start, chunk_len,
            first_len, max_match_pos, max_cardinality, j0,
            k=k, reverse=reverse, complement=complement,
            b_pad=b_local, cap=cap, ev_cap=ev_cap)
        return ev_pack[None], m_flat[None], scalars[None]

    mapped = jax.shard_map(
        stepf, mesh=mesh,
        in_specs=(P(),) * 9,
        out_specs=(P(axis), P(axis), P(axis)),
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


# (geometry key) -> (cap, ev_cap): repeat runs over the same chunk
# geometry skip the raw-total pre-pass round trip (~0.3 s each)
_CAP_CACHE: dict = {}


class DeviceEngine:
    """On-device search over one prepared strand (the ``engine="tpu"``
    production path). With more than one visible device, the probe axis
    is sharded over a mesh (index replicated in every HBM)."""

    def __init__(self, strand, settings, profile: dict | None = None,
                 mesh=None, codes_device=None):
        self.strand = strand
        self.settings = settings
        t0 = time.time()
        self.didx = DeviceIndex.build(
            strand.data, settings.probe_size,
            reverse=settings.reverse, complement=settings.complement,
            codes_device=codes_device)
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

    def _lap(self, t0, what, *sync):
        if not os.environ.get("ASGART_DEVICE_PROFILE"):
            return time.time()
        for x in sync:
            np.asarray(x.ravel()[:1])
        now = time.time()
        print(f"[dscan] {what}: {now - t0:.2f}s", flush=True)
        return now

    def _chunk_geometry(self, chunk):
        s = self.settings
        start, length = chunk
        k = s.probe_size
        if length < s.min_duplication_length:
            return None
        step = k // 2
        bound = length - k - step
        if bound <= 0:
            return None
        n_probes = (bound + step - 1) // step
        n_shards = self.mesh.devices.size if self.mesh is not None else 1
        b_pad = _bucket(n_probes)
        if b_pad % n_shards:
            b_pad += n_shards - (b_pad % n_shards)
        return b_pad, b_pad // n_shards, n_shards

    def _cap_key(self, chunk):
        s = self.settings
        return (self.didx.n, self.didx.first_len, s.probe_size,
                s.reverse, s.complement, s.max_cardinality, chunk)

    def _prepass_total(self, chunk):
        """Dispatch (async) the raw-total pre-pass for one chunk."""
        geo = self._chunk_geometry(chunk)
        if geo is None:
            return None
        b_pad, _, _ = geo
        s = self.settings
        didx = self.didx
        return _raw_total(
            didx.pos_lo, didx.pos_hi, jnp.int32(chunk[0]),
            jnp.int32(chunk[1]), jnp.int32(didx.first_len),
            s.probe_size, s.reverse, s.complement, b_pad)

    def _dispatch_chunk(self, chunk, cap=None, ev_cap=None, total=None):
        """Size + dispatch the device scan for one chunk; returns a
        state dict (results still in flight) or None for empty chunks.
        Dispatching every chunk before collecting any overlaps one
        chunk's downloads with the next one's device execution."""
        geo = self._chunk_geometry(chunk)
        if geo is None:
            return None
        b_pad, b_local, n_shards = geo
        s = self.settings
        start, length = chunk
        k = s.probe_size

        t0 = time.time()
        didx = self.didx
        args = (didx.pos_lo, didx.pos_hi, didx.codes, didx.sa,
                jnp.int32(start), jnp.int32(length),
                jnp.int32(didx.first_len),
                jnp.int32(didx.first_len - 1),
                jnp.int32(s.max_cardinality))
        if cap is None:
            cached = _CAP_CACHE.get(self._cap_key(chunk))
            if cached is not None:
                cap, ev_cap = cached
            else:
                if total is None:
                    total = self._prepass_total(chunk)
                total_raw = int(float(total) * 1.001) + 8
                t0 = self._lap(t0, f"raw-total pre-pass ({total_raw})")
                cap = _bucket(max(total_raw + 1, 1 << 20))
        if ev_cap is None:
            ev_cap = _bucket(min(cap, b_local)) // 4

        if self.mesh is None:
            ev_pack, m_flat, scalars = _scan_chunk(
                *args, jnp.int32(0), k=k, reverse=s.reverse,
                complement=s.complement, b_pad=b_pad, cap=cap,
                ev_cap=ev_cap)
            shards = [(ev_pack, m_flat, scalars)]
        else:
            stepf = _sharded_scan(
                self.mesh, k, s.reverse, s.complement, b_local,
                cap, ev_cap)
            evs, mfs, scs = stepf(*args)
            shards = [(evs[i], mfs[i], scs[i])
                      for i in range(n_shards)]
        self._lap(t0, f"scan dispatch (cap={cap})")
        return {"chunk": chunk, "cap": cap, "ev_cap": ev_cap,
                "shards": shards}

    def _collect_chunk(self, st):
        """Download + merge one dispatched chunk's events and chain
        them; retries the dispatch with doubled capacities on
        overflow."""
        if st is None:
            return []
        s = self.settings
        k = s.probe_size
        while True:
            t0 = time.time()
            parts = []
            overflow_any = False
            max_ev = 0
            for ev_pack, m_flat, scalars in st["shards"]:
                n_events, total_kept, z_trail, overflow = (
                    int(v) for v in np.asarray(scalars))
                overflow_any |= bool(overflow)
                max_ev = max(max_ev, n_events)
                parts.append((np.asarray(ev_pack[:, :n_events]),
                              np.asarray(m_flat[:total_kept]), z_trail))
            t0 = self._lap(t0, "event download")
            if not overflow_any:
                break
            cap, ev_cap = st["cap"], st["ev_cap"]
            if max_ev > ev_cap:
                ev_cap = _bucket(max_ev + 1)
            else:
                cap *= 2  # exact raw total exceeded the estimate
            log.debug("device scan retry: cap=%d ev_cap=%d", cap, ev_cap)
            st = self._dispatch_chunk(st["chunk"], cap=cap, ev_cap=ev_cap)

        _CAP_CACHE[self._cap_key(st["chunk"])] = (st["cap"], st["ev_cap"])
        ev, m_host, z_trail = _merge_shard_events(parts)
        if ev is None:
            return []
        n_events = ev.shape[1]
        m_offsets = np.zeros(n_events + 1, dtype=np.int64)
        np.cumsum(ev[2], out=m_offsets[1:])

        if os.environ.get("ASGART_DEVICE_CHAIN"):
            # full on-device chaining: vmap over provably-independent
            # bursts (chain_jax.chain_bursts). Exact, but the sequential
            # tail is microseconds of host work, so the host event chain
            # stays the default (docs/pallas.md-style measured tradeoff).
            from .chain_jax import ChainConfig, chain_events_device

            cfg = ChainConfig(
                probe_size=k, step_size=k // 2,
                max_gap_size=s.max_gap_size,
                min_duplication_length=s.min_duplication_length,
                max_cardinality=s.max_cardinality)
            try:
                raw_families = chain_events_device(
                    cfg, ev[0], ev[1], m_offsets, m_host, int(z_trail))
            except Exception as e:  # grid too big / HBM: host fallback
                log.warning("device chain fallback: %s", e)
                raw_families = native.chain_events(
                    ev[0], ev[1], m_offsets, m_host, z_trail=z_trail,
                    probe_size=k, step_size=k // 2,
                    max_gap_size=s.max_gap_size,
                    min_duplication_length=s.min_duplication_length,
                    max_cardinality=s.max_cardinality)
        else:
            raw_families = native.chain_events(
                ev[0], ev[1], m_offsets, m_host,
                z_trail=z_trail,
                probe_size=k, step_size=k // 2,
                max_gap_size=s.max_gap_size,
                min_duplication_length=s.min_duplication_length,
                max_cardinality=s.max_cardinality)
        self._lap(t0, "merge+chain")
        return raw_families

    def run_chunk(self, chunk: tuple[int, int]):
        """Families for one chunk, native-engine format + coordinate
        fixup left to the caller (mirrors SearchEngine.run_chunk)."""
        return self._collect_chunk(self._dispatch_chunk(chunk))

    def run_chunks(self, chunks):
        """All chunks, with dispatch/collect pipelining: pre-passes run
        as ONE batched dispatch when the chunks share a lane bucket, and
        chunk i+1 executes on the device while chunk i's events
        download."""
        geos = [self._chunk_geometry(c) for c in chunks]
        cached = [g is None or self._cap_key(c) in _CAP_CACHE
                  for c, g in zip(chunks, geos)]
        geos = [None if hit else g for g, hit in zip(geos, cached)]
        b_pads = {g[0] for g in geos if g is not None}
        if len(b_pads) == 1 and sum(g is not None for g in geos) > 1:
            b_pad = b_pads.pop()
            s = self.settings
            didx = self.didx
            live = [c for c, g in zip(chunks, geos) if g is not None]
            params = jnp.asarray(
                np.array([[c[0], c[1]] for c in live], dtype=np.int32))
            batch = _raw_totals_batch(
                didx.pos_lo, didx.pos_hi, params,
                jnp.int32(didx.first_len), s.probe_size, s.reverse,
                s.complement, b_pad)
            it = iter(np.asarray(batch))
            totals = [float(next(it)) if g is not None else None
                      for g in geos]
        else:
            totals = [None if hit else self._prepass_total(c)
                      for c, hit in zip(chunks, cached)]
        states = [self._dispatch_chunk(c, total=t)
                  for c, t in zip(chunks, totals)]
        return [self._collect_chunk(st) for st in states]
