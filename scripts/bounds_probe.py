"""Micro-probe: where do the 2.63 s of the `tables` lap go at 256M rows?

Times, on the real chip: (a) jnp.cummax at n rows, (b) a blocked
two-level cummax replacement, (c) the `_group_bounds` pass alone,
(d) the `_invert_tables_dec` sort alone, (e) a fused bounds+invert jit.

Usage: python scripts/bounds_probe.py [MROWS]
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
    print(f"{name}: {min(ts):.3f}s  (all {['%.3f' % t for t in ts]})",
          flush=True)
    return outs


rng = np.random.default_rng(0)
print(f"rows: {n/1e6:.0f}M", flush=True)

x = jax.device_put(rng.integers(0, 1 << 30, n, dtype=np.int32))
np.asarray(x[:1])


@jax.jit
def plain_cummax(v):
    return jax.lax.cummax(v)


B = 1 << 13


@jax.jit
def blocked_cummax(v):
    G = v.shape[0] // B
    vb = v.reshape(G, B)
    within = jax.lax.cummax(vb, axis=1)
    block_max = within[:, -1]
    prev = jnp.concatenate([jnp.full(1, -2**31, I32),
                            jax.lax.cummax(block_max)[:-1]])
    return jnp.maximum(within, prev[:, None]).reshape(-1)


timeit("cummax plain", plain_cummax, x)
y = timeit("cummax blocked(8k)", blocked_cummax, x)
yp = np.asarray(plain_cummax(x)[:1000])
yb = np.asarray(y[:1000])
assert (yp == yb).all()

# reverse cummin (run_hi's scan in unflagged mode)
@jax.jit
def plain_cummin_rev(v):
    return jax.lax.cummin(v, reverse=True)


timeit("cummin reverse plain", plain_cummin_rev, x)

del x, y

# --- group_bounds + invert at build shapes --------------------------------
from asgart_tpu.device_engine import table_len_for  # noqa: E402
from asgart_tpu import device_index as di  # noqa: E402

k = 20
L = table_len_for(n, k)
n1 = (n + 1) // 2
skhi = jax.device_put(
    np.sort(rng.integers(0, 1 << 20, n).astype(np.int32)))
sklo = jax.device_put(rng.integers(0, 1 << 10, n, dtype=np.int32))
sa = jax.device_put(rng.permutation(n).astype(np.int32))
np.asarray(sa[:1])


def bounds(skhi, sklo, sa):
    return di._group_bounds_keep(skhi, sklo, sa, jnp.int32(n1),
                                 flagged=True, flag_n_k=k, pad_to=L)


run_lo, run_hi, tied = timeit("group_bounds(flagged)", bounds,
                              skhi, sklo, sa)


def invert(sa, lo, hi):
    return di._invert_tables_dec(sa, lo, hi, k // 2, L)


# note: donation — rebuild inputs per reps via fresh copies is costly;
# measure with donate disabled by calling the impl through jit-again
inv2 = jax.jit(lambda s, a, b: di._invert_tables_dec(s, a, b, k // 2, L))
timeit("invert_tables_dec(no-donate)", inv2, sa, run_lo, run_hi)
