"""Why is the table-inversion sort 2.33 s when the initial sort is
1.37 s at 256M rows? Time lax.sort flavors + the fused-prep candidate.

Usage: python scripts/invert_probe2.py [MROWS]
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

perm = jax.device_put(rng.permutation(n).astype(np.int32))
a = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
b = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
khi = jax.device_put(np.sort(rng.integers(0, 1 << 20, n)).astype(np.int32))
np.asarray(b[:1])


@jax.jit
def s_3op_k1(p, x, y):
    return jax.lax.sort((p, x, y), num_keys=1)


@jax.jit
def s_2op_k1(p, x):
    return jax.lax.sort((p, x), num_keys=1)


@jax.jit
def s_3op_k2(kh, kl, x):
    return jax.lax.sort((kh, kl, x), num_keys=2)


@jax.jit
def s_3op_k1_randkey(kl, x, y):
    return jax.lax.sort((kl, x, y), num_keys=1)


@jax.jit
def s_4op_k1(p, x, y, z):
    return jax.lax.sort((p, x, y, z), num_keys=1)


timeit("sort 3op keys=1 (perm key)  ", s_3op_k1, perm, a, b)
timeit("sort 2op keys=1 (perm key)  ", s_2op_k1, perm, a)
timeit("sort 3op keys=2 (initial-ish)", s_3op_k2, khi, a, b)
timeit("sort 3op keys=1 (rand key)  ", s_3op_k1_randkey, a, perm, b)
timeit("sort 4op keys=1 (perm key)  ", s_4op_k1, perm, a, b, perm)


# candidate: dec computed inline from an [L]-padded sa_ext (no
# concatenate materialization), rank fused
from asgart_tpu.device_engine import table_len_for  # noqa: E402

k = 20
step = k // 2
L = table_len_for(n, k)
C = L // step
pad_tail = np.arange(n, L, dtype=np.int32)
sa_ext = jax.device_put(np.concatenate(
    [np.asarray(perm), pad_tail]))
a_ext = jax.device_put(np.zeros(L, np.int32))
b_ext = jax.device_put(np.zeros(L, np.int32))
np.asarray(sa_ext[:1])


@jax.jit
def s_fused_dec(sa_e, lo_e, hi_e):
    dec = (sa_e % step) * C + sa_e // step
    _, pos_lo, pos_hi = jax.lax.sort((dec, lo_e, hi_e), num_keys=1)
    rank = pos_lo & jnp.int32(0x7FFFFFFF)
    return pos_lo, pos_hi, rank


timeit("fused-dec 3op keys=1 + rank ", s_fused_dec, sa_ext, a_ext, b_ext)


# two sequential 2-op sorts instead of one 3-op
@jax.jit
def s_twice_2op(p, x, y):
    _, lo = jax.lax.sort((p, x), num_keys=1)
    _, hi = jax.lax.sort((p, y), num_keys=1)
    return lo, hi


timeit("2x 2op keys=1               ", s_twice_2op, perm, a, b)
