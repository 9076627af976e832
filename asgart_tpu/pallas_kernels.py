"""Pallas TPU kernels — seed-search exploration.

``fetch_match_windows`` fetches, per probe, the suffix-array window
``sa[lo : lo+RAW]`` by dynamic-offset DMA (double-buffered) and computes
its filter mask on the VPU. It is numerically verified against the XLA
gather path in interpret mode.

Status note (measured on v5e via the axon backend): Mosaic requires HBM
DMA slices aligned to the 1024-element tiling of 1-D refs, so the
per-probe 128-element window DMA does not compile for real TPUs — an
aligned variant would over-fetch 8-16x and lose to XLA's native gather.
The production device path therefore uses a flat CSR gather
(``parallel.ragged_match_gather``): total gathered elements equal the
actual match count (~1-2 per probe) instead of a RAW-sized window, which
beats any windowed formulation, Pallas or XLA. This module is kept as the
documented exploration of the DMA alternative and as a testbed for
per-probe-DMA patterns (useful again once index shards leave HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _kernel(lo_ref, hi_ref, i_ref, prm_ref, sa_hbm, win_ref, keep_ref,
            buf, sems):
    """One grid step = one probe block of PB probes.

    prm_ref (SMEM): [needle_offset, needle_len, reverse, max_match_pos]
    outputs: win_ref [PB, RAW] raw windows; keep_ref [PB, RAW] mask.
    """
    PB = lo_ref.shape[0]
    RAW = win_ref.shape[1]
    n_sa = sa_hbm.shape[0]

    needle_offset = prm_ref[0]
    needle_len = prm_ref[1]
    reverse = prm_ref[2]
    max_match_pos = prm_ref[3]

    def start_of(p):
        # clamp so the fixed-size window DMA stays in bounds
        return jnp.clip(lo_ref[p], 0, jnp.maximum(n_sa - RAW, 0))

    def fetch(slot, p):
        return pltpu.make_async_copy(
            sa_hbm.at[pl.ds(start_of(p), RAW)], buf.at[slot],
            sems.at[slot])

    fetch(0, 0).start()

    def body(p, carry):
        slot = jax.lax.rem(p, 2)
        nxt = jax.lax.rem(p + 1, 2)

        @pl.when(p + 1 < PB)
        def _():
            fetch(nxt, p + 1).start()

        fetch(slot, p).wait()

        lo = lo_ref[p]
        hi = hi_ref[p]
        i = i_ref[p]
        start = start_of(p)
        # window entry t holds sa[start + t]; valid range is [lo, hi)
        t = jax.lax.broadcasted_iota(I32, (1, RAW), 1)
        pos = start + t
        m = buf[slot].reshape(1, RAW)
        keep = (pos >= lo) & (pos < hi) & (m != i) & (m < max_match_pos)
        dir_ok = jnp.where(
            reverse != 0,
            m >= needle_offset + needle_len - i,
            m > i + needle_offset)
        keep = keep & dir_ok
        win_ref[p, :] = m[0]
        keep_ref[p, :] = keep[0].astype(I32)
        return carry

    jax.lax.fori_loop(0, PB, body, None)


@functools.partial(jax.jit, static_argnames=("raw", "block"))
def fetch_match_windows(
    sa_pos: jax.Array,        # [T] int32
    lo: jax.Array, hi: jax.Array, probe_is: jax.Array,   # [B] int32
    needle_offset, needle_len, reverse, max_match_pos,
    raw: int = 128, block: int = 256,
):
    """Returns (windows [B, raw] int32, keep [B, raw] int32 mask)."""
    B = lo.shape[0]
    assert B % block == 0, "pad the probe batch to a block multiple"
    prm = jnp.stack([
        jnp.asarray(needle_offset, I32), jnp.asarray(needle_len, I32),
        jnp.asarray(reverse).astype(I32), jnp.asarray(max_match_pos, I32)])

    win, keep = pl.pallas_call(
        _kernel,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((block, raw), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, raw), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, raw), jnp.int32),
            jax.ShapeDtypeStruct((B, raw), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, raw), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(lo, hi, probe_is, prm, sa_pos)
    return win, keep


def matches_from_windows(win, keep, max_matches: int):
    """XLA-side compaction: masked windows → dense [B, M] match lists in
    window (= suffix) order, -1 padded; plus per-probe counts."""
    B, RAW = win.shape
    counts = jnp.sum(keep, axis=1)
    rank = jnp.cumsum(keep, axis=1) - 1
    rank = jnp.where((keep != 0) & (rank < max_matches), rank, max_matches)
    rows = jnp.broadcast_to(
        jnp.arange(B, dtype=I32)[:, None], rank.shape)
    out = jnp.full((B, max_matches), -1, dtype=I32)
    out = out.at[rows, rank].set(win, mode="drop")
    return out, counts
