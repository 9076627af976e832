"""Microbenchmark the DeviceIndex build's `tables` phase pieces at bench
scale (real chip): _group_bounds vs _invert_tables_dec vs sort operand
counts. Usage: python scripts/tables_probe.py [MBP]
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

MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 128.0
n1 = int(MBP * 1e6) + 1
n = 2 * n1 - 1
k = 20

from asgart_tpu import device_index as D  # noqa: E402
from asgart_tpu.device_engine import table_len_for  # noqa: E402

L = table_len_for(n, k)
print(f"n={n} L={L}", flush=True)

rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    for x in jax.tree.leaves(out):
        np.asarray(x.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts):.3f}s (reps {['%.3f' % t for t in ts]})",
          flush=True)
    return out


# synthetic sorted-key-like inputs (values don't matter for timing)
skhi = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
sklo = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
sa = jnp.asarray(rng.permutation(n).astype(np.int32))

gb = jax.jit(D._group_bounds_impl,
             static_argnames=("flagged", "flag_n_k", "pad_to"))
run_lo, run_hi, tied = timeit(
    "group_bounds(flagged, pad_to=L)",
    lambda: gb(skhi, sklo, sa, jnp.int32(n1), flagged=True, flag_n_k=k,
               pad_to=L))


@jax.jit
def dup(x):
    return x * 1


timeit("invert_tables_dec (donated 3-op sort over L)",
       lambda: D._invert_tables_dec(sa, dup(run_lo), dup(run_hi),
                                    k // 2, L))

# sort operand scaling probes at L rows
key = jnp.asarray(rng.integers(0, n, L, dtype=np.int32))
p1 = jnp.asarray(rng.integers(0, n, L, dtype=np.int32))
p2 = jnp.asarray(rng.integers(0, n, L, dtype=np.int32))


@jax.jit
def sort1(key):
    return jax.lax.sort((key,), num_keys=1)


@jax.jit
def sort2(key, p1):
    return jax.lax.sort((key, p1), num_keys=1)


@jax.jit
def sort3(key, p1, p2):
    return jax.lax.sort((key, p1, p2), num_keys=1)


@jax.jit
def sort2_64(key, p64):
    return jax.lax.sort((key, p64), num_keys=1)


timeit("sort 1-op L", sort1, key)
timeit("sort 2-op L", sort2, key, p1)
timeit("sort 3-op L", sort3, key, p1, p2)
p64 = (p1.astype(jnp.int64) << 32) | p2.astype(jnp.uint32).astype(jnp.int64)
timeit("sort 2-op (i32 key + i64 payload) L", sort2_64, key, p64)

# half-domain variants: two sorts of n1 rows each
keyh = key[:n1]
p1h = p1[:n1]
p2h = p2[:n1]
timeit("sort 2-op n1 (direct half)", sort2, keyh, p1h)
timeit("sort 3-op n1 (appended half)", sort3, keyh, p1h, p2h)
