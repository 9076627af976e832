"""Microbenchmark lax.sort scaling on the real chip (the device index
build is sort-dominated; 512M-row sorts showed a ~35x per-row cliff vs
256M in the 256 Mbp profile — localize it: intrinsic size cliff vs
HBM-pressure degradation).

Usage: python scripts/sort_probe.py [rows_millions ...]
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

SIZES_M = [float(a) for a in sys.argv[1:]] or [128, 256, 320, 384, 448, 512]


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def gen(key, n):
    a = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    b = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, 1 << 30,
                           dtype=jnp.int32)
    return a, b


def bench_sort(n, ops, trials=2):
    k = jax.random.PRNGKey(0)
    a, b = gen(k, n)
    iota = jnp.arange(n, dtype=jnp.int32)

    if ops == 2:
        f = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1))
        args = (a, iota)
    else:
        f = jax.jit(lambda a, b, i: jax.lax.sort((a, b, i), num_keys=2))
        args = (a, b, iota)
    out = f(*args)          # compile + warm
    np.asarray(out[0][:1])
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        out = f(*args)
        np.asarray(out[0][:1])
        best = min(best, time.time() - t0)
    del out
    return best


for m in SIZES_M:
    n = int(m * 1e6)
    for ops in (2, 3):
        t = bench_sort(n, ops)
        print(f"rows={m:.0f}M ops={ops}: {t:.2f}s "
              f"({n / t / 1e6:.0f}M rows/s)", flush=True)
