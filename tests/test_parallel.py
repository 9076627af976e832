"""SPMD sharded search on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from asgart_tpu import native
from asgart_tpu.chain_jax import ChainConfig
from asgart_tpu.index import CODE, GenomeIndex
from asgart_tpu.parallel import (SearchStatics, device_search_step,
                                 make_mesh, shard_probe_positions,
                                 sharded_search_step)
from asgart_tpu.pipeline import _pack_probe_kmers, probe_positions
from asgart_tpu.seed import DeviceSeedIndex, split_planes
from asgart_tpu.structs import RunSettings
from tests.util import plant_duplication


def build_device_inputs(text: bytes, settings: RunSettings):
    idx = GenomeIndex.build(
        np.frombuffer(text, dtype=np.uint8), settings.probe_size)
    dsi = DeviceSeedIndex(idx)
    arr = np.frombuffer(text[:-1], dtype=np.uint8)
    is_ = probe_positions(arr, settings.probe_size)
    codes = np.zeros(len(arr) + settings.probe_size, dtype=np.uint8)
    codes[:len(arr)] = CODE[arr]
    cfg = ChainConfig(
        probe_size=settings.probe_size,
        step_size=settings.probe_size // 2,
        max_gap_size=settings.max_gap_size,
        min_duplication_length=settings.min_duplication_length,
        max_cardinality=settings.max_cardinality,
        max_arms=128, max_matches=64, out_cap=512)
    statics = SearchStatics(cfg=cfg, k=settings.probe_size,
                            steps=dsi.steps, prefix_shift=dsi.prefix_shift,
                            raw_cap=64)
    args = dict(
        key_hi=dsi.key_hi, key_lo=dsi.key_lo,
        bucket_starts=dsi.bucket_starts,
        sa_pos=jnp.asarray(idx.sa.astype(np.int32)),
        codes=jnp.asarray(codes),
        needle_offset=jnp.int32(0),
        needle_len=jnp.int32(len(arr)),
        reverse=jnp.asarray(False),
    )
    return idx, is_, statics, args


def test_single_device_step_matches_native():
    rng = np.random.default_rng(0)
    text = plant_duplication(rng, 6000, 800, 700, 4200, noise=0.01) + b"$"
    settings = RunSettings(probe_size=16, max_gap_size=60,
                           min_duplication_length=500, max_cardinality=50)
    idx, is_, statics, args = build_device_inputs(text, settings)

    out, n_out, n_fam, n_hits, n_dropped = device_search_step(
        statics, args["key_hi"], args["key_lo"], args["bucket_starts"],
        args["sa_pos"], args["codes"],
        jnp.asarray(is_.astype(np.int32)),
        args["needle_offset"], args["needle_len"], args["reverse"])
    out = np.asarray(out)[: int(n_out)]

    pk = _pack_probe_kmers(
        np.asarray(args["codes"]), is_, settings.probe_size)
    lo, hi = idx.lookup(pk)
    want = native.chain(
        idx.sa, is_, lo, hi,
        probe_size=settings.probe_size,
        step_size=settings.probe_size // 2,
        max_gap_size=settings.max_gap_size,
        min_duplication_length=settings.min_duplication_length,
        max_cardinality=settings.max_cardinality,
        needle_offset=0, needle_len=len(text) - 1, reverse=False)
    flat_want = [sd for fam in want for sd in fam]
    got = [tuple(int(x) for x in row[:4]) for row in out]
    assert got == flat_want
    assert flat_want, "nothing found"
    assert int(n_hits) > 0


def test_sharded_step_runs_on_mesh():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected virtual 8-device mesh, got {n_dev}"
    rng = np.random.default_rng(1)
    # the duplication must sit inside one shard's probe slice: each shard
    # covers ~1/8 of the needle, and arms open at a shard boundary are
    # dropped (reference end-of-needle semantics; stitching is the
    # sharded-chain growth path)
    text = plant_duplication(rng, 24000, 800, 2000, 15000) + b"$"
    settings = RunSettings(probe_size=16, max_gap_size=60,
                           min_duplication_length=500, max_cardinality=50)
    idx, is_, statics, args = build_device_inputs(text, settings)

    mesh = make_mesh()
    step = sharded_search_step(statics, mesh)
    pos_sharded = shard_probe_positions(is_.astype(np.int32), n_dev)

    out, n_out, n_fam, total_hits, total_dropped = step(
        args["key_hi"], args["key_lo"], args["bucket_starts"],
        args["sa_pos"], args["codes"], jnp.asarray(pos_sharded),
        args["needle_offset"], args["needle_len"], args["reverse"])
    jax.block_until_ready(out)
    # per-shard outputs are stacked: OUT rows per shard
    assert out.shape[0] == n_dev * statics.cfg.out_cap
    assert int(total_hits) > 0
    # every duplicon found on some shard (the planted one spans shards'
    # interiors; shard-boundary splits may fragment it, but total SDs > 0)
    assert int(np.sum(np.asarray(n_out).reshape(-1))) > 0


def test_table_step_matches_native():
    from asgart_tpu.index import PositionIndex
    from asgart_tpu.parallel import device_table_search_step

    rng = np.random.default_rng(3)
    text = plant_duplication(rng, 6000, 800, 700, 4200, noise=0.01) + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    settings = RunSettings(probe_size=16, max_gap_size=60,
                           min_duplication_length=500, max_cardinality=50)
    k = settings.probe_size
    pidx = PositionIndex.build(data, k)
    is_ = probe_positions(data[:-1], k)
    table_x = pidx.probe_table_positions(0, len(data) - 1, is_)

    cfg = ChainConfig(probe_size=k, step_size=k // 2,
                      max_gap_size=settings.max_gap_size,
                      min_duplication_length=settings.min_duplication_length,
                      max_cardinality=settings.max_cardinality,
                      max_arms=128, max_matches=64, out_cap=512)
    statics = SearchStatics(cfg=cfg, k=k, steps=1, prefix_shift=-1,
                            raw_cap=64)
    out, n_out, n_fam, n_hits, n_dropped = device_table_search_step(
        statics,
        jnp.asarray(pidx.pos_lo.astype(np.int32)),
        jnp.asarray(pidx.pos_hi.astype(np.int32)),
        jnp.asarray(pidx.sa.astype(np.int32)),
        jnp.asarray(table_x.astype(np.int32)),
        jnp.asarray(is_.astype(np.int32)),
        jnp.int32(0), jnp.int32(len(data) - 1),
        jnp.asarray(False), jnp.int32(pidx.first_len - 1))
    got = [tuple(int(v) for v in row[:4])
           for row in np.asarray(out)[: int(n_out)]]

    lo, hi = pidx.probe_ranges(0, len(data) - 1, is_)
    want_fams = native.chain(
        pidx.sa, is_, lo, hi,
        probe_size=k, step_size=k // 2,
        max_gap_size=settings.max_gap_size,
        min_duplication_length=settings.min_duplication_length,
        max_cardinality=settings.max_cardinality,
        needle_offset=0, needle_len=len(data) - 1, reverse=False,
        max_match_pos=pidx.first_len - 1)
    want = [sd for fam in want_fams for sd in fam]
    assert got == want
    assert want


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    res = jax.jit(fn)(*args)
    jax.block_until_ready(res)
    ev_pack, m_flat, scalars = res
    n_events, total_kept, z_trail, overflow = (
        int(v) for v in np.asarray(scalars))
    assert n_events > 0 and total_kept > 0 and not overflow
    ge.dryrun_multichip(8)


def test_sharded_index_lookup():
    """Index sharded by text range (tables) and rank range (SA): lookups
    must reconstruct the replicated-index results exactly."""
    from asgart_tpu.index import PositionIndex
    from asgart_tpu.parallel import sharded_index_lookup_step

    rng = np.random.default_rng(7)
    text = plant_duplication(rng, 12000, 900, 1000, 8000) + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    k = 16
    pidx = PositionIndex.build(data, k)
    is_ = probe_positions(data[:-1], k)
    table_x = pidx.probe_table_positions(0, len(data) - 1, is_)

    n_dev = len(jax.devices())
    T = len(pidx.ranges)
    S = -(-T // n_dev)
    pad_t = n_dev * S - T
    ranges_p = np.concatenate(
        [pidx.ranges, np.zeros((pad_t, 2), np.int32)]).astype(np.int32)
    sa_p = np.concatenate(
        [pidx.sa, np.full(pad_t, -1)]).astype(np.int32)

    M = 32
    mesh = make_mesh(axis="shards")
    step = sharded_index_lookup_step(mesh)
    lo, hi, matches, counts = step(
        jnp.asarray(ranges_p), jnp.asarray(sa_p),
        jnp.asarray(table_x.astype(np.int32)),
        jnp.zeros(M, np.int32))

    lo_ref, hi_ref = pidx.probe_ranges(0, len(data) - 1, is_)
    np.testing.assert_array_equal(np.asarray(lo), lo_ref)
    np.testing.assert_array_equal(np.asarray(hi), hi_ref)
    matches = np.asarray(matches)
    total = 0
    for p in range(len(is_)):
        want = pidx.sa[lo_ref[p]:hi_ref[p]][:M]
        got = matches[p][: len(want)]
        np.testing.assert_array_equal(got, want, err_msg=f"probe {p}")
        total += len(want)
    assert total > 0
