"""Pallas match-window kernel vs the XLA gather path (interpret mode on
the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asgart_tpu import pallas_kernels as pk
from asgart_tpu.index import PositionIndex
from asgart_tpu.pipeline import probe_positions
from asgart_tpu.structs import RunSettings
from tests.util import plant_duplication, revcomp


def xla_reference(sa_pos, lo, hi, probe_is, needle_offset, needle_len,
                  reverse, max_match_pos, raw):
    t = jnp.arange(raw, dtype=jnp.int32)[None, :]
    idx = lo[:, None] + t
    in_range = idx < hi[:, None]
    m = sa_pos[jnp.minimum(idx, sa_pos.shape[0] - 1)]
    i_col = probe_is[:, None]
    keep = in_range & (m != i_col) & (m < max_match_pos)
    dir_ok = jnp.where(reverse, m >= needle_offset + needle_len - i_col,
                       m > i_col + needle_offset)
    keep = keep & dir_ok
    return np.asarray(m), np.asarray(keep)


@pytest.mark.parametrize("reverse", [False, True])
def test_fetch_match_windows_matches_xla(reverse):
    rng = np.random.default_rng(0)
    text = plant_duplication(rng, 6000, 800, 700, 4200, noise=0.01,
                             transform=revcomp if reverse else None) + b"$"
    data = np.frombuffer(text, dtype=np.uint8)
    k = 16
    pidx = PositionIndex.build(data, k, reverse=reverse, complement=reverse)
    is_ = probe_positions(data[:-1], k)
    lo, hi = pidx.probe_ranges(0, len(data) - 1, is_)

    block = 128
    pad = (-len(is_)) % block
    lo_p = np.concatenate([lo, np.zeros(pad, lo.dtype)]).astype(np.int32)
    hi_p = np.concatenate([hi, np.zeros(pad, hi.dtype)]).astype(np.int32)
    is_p = np.concatenate([is_, np.zeros(pad, is_.dtype)]).astype(np.int32)
    sa32 = pidx.sa.astype(np.int32)
    raw = 128
    args = (jnp.asarray(sa32), jnp.asarray(lo_p), jnp.asarray(hi_p),
            jnp.asarray(is_p), 0, len(data) - 1, reverse,
            pidx.first_len - 1)

    with jax.disable_jit():  # interpret pallas on CPU
        import jax.experimental.pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            win, keep = pk.fetch_match_windows(
                *args, raw=raw, block=block)
    win = np.asarray(win)
    keep = np.asarray(keep)

    m_ref, keep_ref = xla_reference(
        jnp.asarray(sa32), jnp.asarray(lo_p), jnp.asarray(hi_p),
        jnp.asarray(is_p), 0, len(data) - 1, reverse,
        pidx.first_len - 1, raw)

    # per-probe kept values must agree exactly and in order (the raw
    # window may be shifted where the end-clamped DMA start differs)
    kb = keep.astype(bool)
    assert kb.sum() == keep_ref.sum() > 0
    for p in range(win.shape[0]):
        np.testing.assert_array_equal(win[p][kb[p]], m_ref[p][keep_ref[p]],
                                      err_msg=f"probe {p}")


def test_matches_from_windows_compaction():
    win = jnp.asarray([[5, 7, 9, 11], [1, 2, 3, 4]], dtype=jnp.int32)
    keep = jnp.asarray([[1, 0, 1, 1], [0, 0, 0, 0]], dtype=jnp.int32)
    out, counts = pk.matches_from_windows(win, keep, max_matches=3)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[5, 9, 11], [-1, -1, -1]])
    np.testing.assert_array_equal(np.asarray(counts), [3, 0])
