"""Candidate: n-row inversion sort + static slice assembly into the
padded [L] decimated layout (the current sort runs over L = n + ~21M
rows, which crosses the next power-of-2 at bench scale — 2.33 s vs the
1.66 s n-row sort).

The decimated layout is step contiguous rows of stride C = L/step, and
the live entries (p < n) occupy a contiguous PREFIX of each row — so
the dec-sorted live stream is exactly the concatenation of the rows'
live prefixes, and the padded tables assemble with `step` static
contiguous copies into zeroed [L] buffers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

MROWS = int(float(sys.argv[1]) if len(sys.argv) > 1 else 256)
n = MROWS * 1_000_000
I32 = jnp.int32


def timeit(name, fn, *args, reps=3):
    outs = fn(*args)
    first = outs[0] if isinstance(outs, (tuple, list)) else outs
    np.asarray(first.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = fn(*args)
        first = outs[0] if isinstance(outs, (tuple, list)) else outs
        np.asarray(first.ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts):.3f}s", flush=True)
    return outs


rng = np.random.default_rng(0)
print(f"rows: {n/1e6:.0f}M", flush=True)

from asgart_tpu.device_engine import table_len_for  # noqa: E402
from asgart_tpu import device_index as di  # noqa: E402

k = 20
step = k // 2
L = table_len_for(n, k)
C = L // step

perm = rng.permutation(n).astype(np.int32)
sa = jax.device_put(perm)
lo_n = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
hi_n = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
np.asarray(hi_n[:1])


@jax.jit
def invert_nrow(sa, lo, hi):
    dec = (sa % step) * C + sa // step
    _, lo_c, hi_c = jax.lax.sort((dec, lo, hi), num_keys=1)
    pos_lo = jnp.zeros(L, I32)
    pos_hi = jnp.zeros(L, I32)
    off = 0
    for r in range(step):
        live = (n - r + step - 1) // step
        pos_lo = jax.lax.dynamic_update_slice(
            pos_lo, jax.lax.dynamic_slice(lo_c, (off,), (live,)),
            (r * C,))
        pos_hi = jax.lax.dynamic_update_slice(
            pos_hi, jax.lax.dynamic_slice(hi_c, (off,), (live,)),
            (r * C,))
        off += live
    rank = pos_lo & jnp.int32(0x7FFFFFFF)
    return pos_lo, pos_hi, rank


out = timeit("invert n-row + assembly  ", invert_nrow, sa, lo_n, hi_n)

# correctness vs the production [L]-row sort
lo_ext = jnp.zeros(L, I32).at[:n].set(lo_n)
hi_ext = jnp.zeros(L, I32).at[:n].set(hi_n)
ref = jax.jit(lambda s, a, b: di._invert_tables_dec(s, a, b, step, L))(
    sa, lo_ext, hi_ext)
for name, x, y in (("pos_lo", out[0], ref[0]), ("pos_hi", out[1], ref[1]),
                   ("rank", out[2], ref[2])):
    xs = np.asarray(x)
    ys = np.asarray(y)
    np.testing.assert_array_equal(xs[:4096], ys[:4096])
    np.testing.assert_array_equal(xs[C - 4096:C + 4096],
                                  ys[C - 4096:C + 4096])
    idx = rng.integers(0, L, 100000)
    np.testing.assert_array_equal(xs[idx], ys[idx])
print("n-row assembly matches production on sampled rows", flush=True)
