"""Remaining invert-sort variants (continuation of invert_probe2)."""
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
pad_tail = np.arange(n, L, dtype=np.int32)
sa_ext = jax.device_put(np.concatenate([perm, pad_tail]))
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


@jax.jit
def s_fused_dec_norank(sa_e, lo_e, hi_e):
    dec = (sa_e % step) * C + sa_e // step
    _, pos_lo, pos_hi = jax.lax.sort((dec, lo_e, hi_e), num_keys=1)
    return pos_lo, pos_hi


timeit("fused-dec 3op keys=1 norank ", s_fused_dec_norank,
       sa_ext, a_ext, b_ext)

# production function (with its concatenate prep), no donation
from asgart_tpu import device_index as di  # noqa: E402

sa_dev = jax.device_put(perm)
inv2 = jax.jit(lambda s, a, b: di._invert_tables_dec(s, a, b, step, L))
timeit("production invert (no-donate)", inv2, sa_dev, a_ext, b_ext)
