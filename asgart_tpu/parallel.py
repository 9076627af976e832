"""Multi-device execution: probe-parallel search over a ``jax.sharding.Mesh``.

NB (round 2): this module is the round-1 SPMD *prototype*, kept for its
tests and as the simplest readable statement of the sharding design. The
PRODUCTION multi-device paths live in :mod:`asgart_tpu.device_engine`
(`_sharded_scan` probe-axis SPMD, `MeshWindowEngine` composed
windows × probes mesh) on top of the on-device index build
(:mod:`asgart_tpu.device_index`).

The reference's scale-out axes (SURVEY §2): rayon chunk-parallelism within
one host plus the manual ``--trim`` + ``asgart-slice`` merge workflow. The
TPU-native design replaces both with SPMD over a device mesh:

  * the index (two-plane sorted k-mers, bucket table, SA positions) is
    *replicated* per device (genome ≤ HBM) — index *sharding* across
    devices is the growth path for >HBM genomes,
  * probe batches are sharded along the ``probes`` mesh axis with
    ``shard_map``; every device runs the identical jitted step: pack →
    equal-range → gather/filter → chain,
  * per-shard duplicon counts are combined with ``psum`` (the family
    *merge* itself is a host-side concatenation in probe order, matching
    the reference's fold over chunk results, asgart.rs:241-253).

Shard boundaries act like the reference's chunk boundaries for chaining
(each shard runs its own automaton).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .chain_jax import ChainConfig, chain_scan
from .seed import equal_range, pack_probe_planes

I32 = jnp.int32


class SearchStatics(NamedTuple):
    """Static (compile-time) parameters of the device search step."""
    cfg: ChainConfig
    k: int
    steps: int           # binary-search depth
    prefix_shift: int
    raw_cap: int         # max raw SA-range length gathered per probe


@functools.partial(jax.jit, static_argnames=("statics",))
def device_search_step(
    statics: SearchStatics,
    key_hi: jax.Array, key_lo: jax.Array,      # [N] index planes
    bucket_starts: jax.Array,                  # [2^pb + 1]
    sa_pos: jax.Array,                         # [N] int32 absolute positions
    codes: jax.Array,                          # [L + k] needle symbol ranks
    positions: jax.Array,                      # [B] probe indices (-1 = pad)
    needle_offset: jax.Array,                  # scalar i32
    needle_len: jax.Array,                     # scalar i32
    reverse: jax.Array,                        # scalar bool
):
    """The full on-device search step for one probe batch: pack probes,
    equal-range lookup, gather+filter matches, run the chain scan.

    Returns (out [OUT, 5], n_out, n_families, n_hits, n_dropped);
    ``n_out > out_cap`` or ``n_dropped > 0`` signal capacity overflow
    (see ``chain_scan``).
    """
    cfg = statics.cfg
    pad = positions < 0
    pos_safe = jnp.maximum(positions, 0)

    phi, plo = pack_probe_planes(codes, pos_safe, statics.k)
    left, right = equal_range(
        key_hi, key_lo, bucket_starts, phi, plo,
        steps=statics.steps, prefix_shift=statics.prefix_shift)
    left = jnp.where(pad, 0, left)
    right = jnp.where(pad, 0, right)

    # --- gather + filter matches in SA order -----------------------------
    RAW = statics.raw_cap
    t = jnp.arange(RAW, dtype=I32)[None, :]
    idx = left[:, None] + t                       # [B, RAW]
    in_range = idx < right[:, None]
    m = sa_pos[jnp.minimum(idx, sa_pos.shape[0] - 1)]
    i_col = pos_safe[:, None]
    keep = in_range & (m != i_col)
    dir_ok = jnp.where(
        reverse,
        m >= needle_offset + needle_len - i_col,
        m > i_col + needle_offset)
    keep = keep & dir_ok
    counts = jnp.sum(keep, axis=1)
    raw_overflow = (right - left) > RAW
    valid = (~pad) & (counts <= cfg.max_cardinality) & ~raw_overflow

    M = cfg.max_matches
    rank = jnp.cumsum(keep.astype(I32), axis=1) - 1       # [B, RAW]
    rank = jnp.where(keep & (rank < M), rank, M)
    rows = jnp.broadcast_to(
        jnp.arange(positions.shape[0], dtype=I32)[:, None], rank.shape)
    matches = jnp.full((positions.shape[0], M), -1, dtype=I32)
    matches = matches.at[rows, rank].set(m, mode="drop")

    out, n_out, n_fam, n_dropped = chain_scan(cfg, pos_safe, matches, valid)
    n_hits = jnp.sum(jnp.where(valid, counts, 0))
    return out, n_out, n_fam, n_hits, n_dropped


def ragged_match_gather(sa_pos, left, right, total_cap: int):
    """Flat CSR gather of all match windows.

    Instead of materializing a [B, RAW] window per probe (RAW-fold
    overfetch for typically 1-2 matches), concatenate the ragged ranges
    [left, right) into one flat index stream of at most ``total_cap``
    elements: one gather sized by the *actual* match count.

    Returns (probe_id [cap], m [cap], within [cap], flat_valid [cap],
    counts_raw [B], overflow [B]) — ``overflow`` marks probes whose range
    did not fit fully below the cap (callers must invalidate them).
    """
    B = left.shape[0]
    counts = (right - left).astype(I32)
    offsets = jnp.concatenate(
        [jnp.zeros(1, I32), jnp.cumsum(counts).astype(I32)])
    starts = offsets[:-1]
    # probe id per flat slot: scatter-add 1 at each probe's start, cumsum
    seg = jnp.zeros(total_cap + 1, I32).at[
        jnp.minimum(starts, total_cap)].add(1, mode="drop")
    probe_id = jnp.cumsum(seg[:total_cap]) - 1
    probe_id = jnp.clip(probe_id, 0, B - 1)
    flat_pos = jnp.arange(total_cap, dtype=I32)
    within = flat_pos - starts[probe_id]
    flat_valid = (flat_pos < offsets[-1]) & (within < counts[probe_id])
    idx = jnp.clip(left[probe_id] + within, 0, sa_pos.shape[0] - 1)
    m = sa_pos[idx]
    overflow = (offsets[1:] > total_cap) & (counts > 0)
    return probe_id, m, within, flat_valid, counts, overflow


@functools.partial(jax.jit, static_argnames=("statics",))
def device_table_search_step(
    statics: SearchStatics,
    pos_lo: jax.Array, pos_hi: jax.Array,   # [T] per-position range tables
    sa_pos: jax.Array,                      # [T] int32 suffix-order positions
    table_x: jax.Array,                     # [B] probe table positions (-1 pad)
    probe_is: jax.Array,                    # [B] needle-relative probe indices
    needle_offset: jax.Array, needle_len: jax.Array, reverse: jax.Array,
    max_match_pos: jax.Array,
):
    """Doubled-text device step: probe ranges by one table gather (no
    search), then match gather/filter + chain scan. The production-fast
    analog of ``device_search_step``."""
    cfg = statics.cfg
    B = table_x.shape[0]
    pad = table_x < 0
    x = jnp.maximum(table_x, 0)
    left = jnp.where(pad, 0, pos_lo[x])
    right = jnp.where(pad, 0, pos_hi[x])

    # flat CSR gather: total elements = actual match count, not B×RAW
    total_cap = statics.raw_cap * B // 16 + 1024
    probe_id, m, within, flat_valid, counts_raw, overflow = \
        ragged_match_gather(sa_pos, left, right, total_cap)

    i_of = jnp.maximum(probe_is, 0)[probe_id]
    keep = flat_valid & (m != i_of) & (m < max_match_pos)
    dir_ok = jnp.where(
        reverse,
        m >= needle_offset + needle_len - i_of,
        m > i_of + needle_offset)
    keep = keep & dir_ok
    keep_i = keep.astype(I32)

    # per-probe kept counts and ranks (segmented cumsum over the stream)
    counts = jnp.zeros(B, I32).at[probe_id].add(keep_i, mode="drop")
    ck = jnp.cumsum(keep_i)
    offsets = jnp.concatenate(
        [jnp.zeros(1, I32), jnp.cumsum((right - left).astype(I32))])
    starts = jnp.minimum(offsets[:-1], total_cap - 1)
    base = ck[starts] - keep_i[starts]
    rank = ck - 1 - base[probe_id]

    M = cfg.max_matches
    rank = jnp.where(keep & (rank < M), rank, M)
    matches = jnp.full((B, M), -1, dtype=I32)
    matches = matches.at[probe_id, rank].set(m, mode="drop")

    valid = (~pad) & (counts <= cfg.max_cardinality) & ~overflow
    out, n_out, n_fam, n_dropped = chain_scan(
        cfg, jnp.maximum(probe_is, 0), matches, valid)
    n_hits = jnp.sum(jnp.where(valid, counts, 0))
    return out, n_out, n_fam, n_hits, n_dropped


def sharded_table_search_step(statics: SearchStatics, mesh: Mesh,
                              axis: str = "probes"):
    """SPMD table-gather search: tables replicated, probes sharded."""
    rep = P()
    shard = P(axis)

    def step(pos_lo, pos_hi, sa_pos, table_x, probe_is,
             needle_offset, needle_len, reverse, max_match_pos):
        out, n_out, n_fam, n_hits, n_dropped = device_table_search_step(
            statics, pos_lo, pos_hi, sa_pos, table_x, probe_is,
            needle_offset, needle_len, reverse, max_match_pos)
        total_hits = jax.lax.psum(n_hits, axis)
        total_dropped = jax.lax.psum(n_dropped, axis)
        return out, n_out[None], n_fam[None], total_hits, total_dropped

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, rep, shard, shard, rep, rep, rep, rep),
        out_specs=(shard, shard, shard, rep, rep),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_index_lookup_step(mesh: Mesh, axis: str = "shards"):
    """Sharded-INDEX lookup (docs/sharding.md): the range table is sharded
    by contiguous text range and the suffix array by contiguous rank
    range — each device holds 1/D of the index, which is how genomes
    beyond one chip's HBM are served.

    Per step: every device resolves the probes whose table position falls
    in its text slice, the (lo, hi) streams are combined with an
    ``all_gather`` over ICI, and each device CSR-gathers the match
    positions that fall in its rank slice; a final ``all_gather`` + rank
    concatenation rebuilds the full match stream in suffix order.

    Inputs (per device via shard_map):
      ranges_shard [S, 2], sa_shard [R], table_x [B] (replicated),
      with S = ceil(T/D), R = ceil(T/D).
    Returns (lo [B], hi [B], matches [B, M] by suffix order, counts [B]).
    """
    def step(ranges_shard, sa_shard, table_x, max_matches_arr):
        D = jax.lax.axis_size(axis)
        d = jax.lax.axis_index(axis)
        S = ranges_shard.shape[0]
        R = sa_shard.shape[0]
        M = max_matches_arr.shape[0]  # static via array length

        # --- phase 1: table lookup on the owning text shard -----------
        owned = (table_x >= d * S) & (table_x < (d + 1) * S)
        local_x = jnp.clip(table_x - d * S, 0, S - 1)
        r = ranges_shard[local_x]
        lo = jnp.where(owned, r[:, 0], 0)
        hi = jnp.where(owned, r[:, 1], 0)
        # combine: each probe owned by exactly one shard
        lo = jax.lax.psum(lo, axis)
        hi = jax.lax.psum(hi, axis)

        # --- phase 2: gather matches from the owning rank shards ------
        # each device extracts the slice of [lo, hi) that intersects its
        # rank range [d*R, (d+1)*R)
        a = jnp.clip(lo, d * R, (d + 1) * R)
        b = jnp.clip(hi, d * R, (d + 1) * R)
        t = jnp.arange(M, dtype=I32)[None, :]
        idx = a[:, None] + t
        valid = idx < b[:, None]
        local = sa_shard[jnp.clip(idx - d * R, 0, R - 1)]
        # slot position within the probe's full [lo, hi) range keeps the
        # suffix order when shards' contributions are summed
        slot = idx - lo[:, None]
        contrib = jnp.zeros((table_x.shape[0], M), dtype=I32)
        rows = jnp.broadcast_to(
            jnp.arange(table_x.shape[0], dtype=I32)[:, None], idx.shape)
        slot = jnp.where(valid & (slot < M), slot, M)
        contrib = contrib.at[rows, slot].add(
            jnp.where(valid, local + 1, 0), mode="drop")
        matches = jax.lax.psum(contrib, axis) - 1  # -1 where no shard wrote
        counts = jnp.minimum(hi - lo, M)
        return lo, hi, matches, counts

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_mesh(n_devices: int | None = None,
              axis: str = "probes") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_search_step(statics: SearchStatics, mesh: Mesh,
                        axis: str = "probes"):
    """Build the SPMD search step: index replicated, probes sharded.

    Returns a jitted function with the same signature as
    ``device_search_step`` (minus statics); per-shard outputs are stacked
    along the mesh axis and the total hit count is ``psum``-reduced.
    """
    rep = P()
    shard = P(axis)

    def step(key_hi, key_lo, bucket_starts, sa_pos, codes, positions,
             needle_offset, needle_len, reverse):
        out, n_out, n_fam, n_hits, n_dropped = device_search_step(
            statics, key_hi, key_lo, bucket_starts, sa_pos, codes,
            positions, needle_offset, needle_len, reverse)
        total_hits = jax.lax.psum(n_hits, axis)
        total_dropped = jax.lax.psum(n_dropped, axis)
        # rank-0 per-shard values get a singleton axis for concatenation
        return out, n_out[None], n_fam[None], total_hits, total_dropped

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, shard, rep, rep, rep),
        out_specs=(shard, shard, shard, rep, rep),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_probe_positions(positions: np.ndarray, n_shards: int,
                          batch_per_shard: int | None = None) -> np.ndarray:
    """Split a probe-position stream into contiguous per-shard slices,
    padded with -1 to a common length (shard boundary == chunk boundary
    for the automaton)."""
    per = int(np.ceil(len(positions) / n_shards))
    if batch_per_shard is not None:
        per = max(per, batch_per_shard)
    out = np.full((n_shards, per), -1, dtype=np.int32)
    for s in range(n_shards):
        part = positions[s * per: (s + 1) * per]
        out[s, :len(part)] = part
    return out.reshape(n_shards * per)
