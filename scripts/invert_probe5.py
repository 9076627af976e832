"""Input-fusion cost of lax.sort: computing a sort operand INLINE makes
the sort ~40% slower (2.34 s vs 1.66 s + 0.035 s at 256M rows) — XLA
fuses the producer into the sort's data path. Measure
optimization_barrier'd variants (materialize operands first).
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

k = 20
step = k // 2
L = table_len_for(n, k)
C = L // step

perm = rng.permutation(n).astype(np.int32)
sa_ext = jax.device_put(np.concatenate(
    [perm, np.arange(n, L, dtype=np.int32)]))
a_ext = jax.device_put(np.zeros(L, np.int32))
b_ext = jax.device_put(np.zeros(L, np.int32))
np.asarray(sa_ext[:1])


@jax.jit
def s_barrier_dec(sa_e, lo_e, hi_e):
    dec = (sa_e % step) * C + sa_e // step
    (dec,) = jax.lax.optimization_barrier((dec,))
    _, pos_lo, pos_hi = jax.lax.sort((dec, lo_e, hi_e), num_keys=1)
    rank = pos_lo & jnp.int32(0x7FFFFFFF)
    return pos_lo, pos_hi, rank


timeit("barrier-dec sort + rank     ", s_barrier_dec,
       sa_ext, a_ext, b_ext)

# flagged initial sort, inline vs barrier
key_hi = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
key_lo = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
np.asarray(key_lo[:1])
n1 = (n + 1) // 2


@jax.jit
def s_flagged_inline(kh, kl):
    iota = jnp.arange(n, dtype=I32)
    flagged = ((kl >> 1) << 1) | (iota >= n1).astype(I32)
    return jax.lax.sort((kh, flagged, iota), num_keys=2)


@jax.jit
def s_flagged_barrier(kh, kl):
    iota = jnp.arange(n, dtype=I32)
    flagged = ((kl >> 1) << 1) | (iota >= n1).astype(I32)
    (flagged, iota) = jax.lax.optimization_barrier((flagged, iota))
    return jax.lax.sort((kh, flagged, iota), num_keys=2)


timeit("flagged sort inline (prod-ish)", s_flagged_inline, key_hi, key_lo)
timeit("flagged sort barrier          ", s_flagged_barrier, key_hi, key_lo)
