"""Probe: donated 3-op inversion sort, blocked extract-tied, placement.

Usage: python scripts/invert_probe.py [MBP]
"""
import functools
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
step = k // 2

from asgart_tpu.device_engine import table_len_for  # noqa: E402
from asgart_tpu.device_index import _dec_of  # noqa: E402

L = table_len_for(n, k)
I32 = jnp.int32
print(f"n={n} L={L}", flush=True)
rng = np.random.default_rng(0)

sa_h = rng.permutation(n).astype(np.int32)
lo_h = rng.integers(0, n, L, dtype=np.int32)
hi_h = rng.integers(0, n, L, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("step", "L"),
                   donate_argnums=(1, 2))
def invert_don(sa, lo_ext, hi_ext, step, L):
    C = L // step
    tail = jnp.arange(sa.shape[0], L, dtype=I32)
    dec = jnp.concatenate([_dec_of(sa, step, C), _dec_of(tail, step, C)])
    _, pos_lo, pos_hi = jax.lax.sort((dec, lo_ext, hi_ext), num_keys=1)
    return pos_lo, pos_hi


@jax.jit
def dup(x):
    return x * 1


sa_d = jax.device_put(sa_h)
_lo0 = jax.device_put(lo_h)
_hi0 = jax.device_put(hi_h)


def run_invert():
    ts = []
    for i in range(4):
        a = (sa_d, dup(_lo0), dup(_hi0))
        for x in a[1:]:
            np.asarray(x[:1])  # sync the dups
        t0 = time.time()
        out = invert_don(*a, step, L)
        np.asarray(out[0][:1])
        np.asarray(out[1][:1])
        if i:  # first rep includes compile
            ts.append(time.time() - t0)
    print(f"invert donated 3-op L: {min(ts):.3f}s "
          f"({['%.3f' % t for t in ts]})", flush=True)


run_invert()


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
    print(f"{name}: {min(ts):.3f}s ({['%.3f' % t for t in ts]})", flush=True)
    return out


B = 1 << 14
cap = 1 << 21
tied_h = np.zeros(n, dtype=bool)
tied_h[rng.choice(n, 1_200_000, replace=False)] = True


@functools.partial(jax.jit, static_argnames=("cap", "B"))
def extract_blocked(tied, cap, B):
    nn = tied.shape[0]
    G = (nn + B - 1) // B
    pad = G * B - nn
    iota = jnp.arange(nn, dtype=I32)
    key = jnp.where(tied, iota, nn)
    key2 = jnp.concatenate([key, jnp.full(pad, nn, I32)]).reshape(G, B)
    skey = jax.lax.sort(key2, dimension=1)
    counts = jnp.sum((key2 < nn).astype(I32), axis=1)
    offs = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(counts)[:-1]])
    total = jnp.sum(counts)
    marks = jnp.zeros(cap, I32).at[offs].add(1, mode="drop")
    block_of = jnp.cumsum(marks) - 1
    jcap = jnp.arange(cap, dtype=I32)
    j = jcap - offs[block_of]
    vals = skey[block_of, j]
    out = jnp.where(jcap < total, vals, nn)
    return out, total


@functools.partial(jax.jit, static_argnames=("cap",))
def extract_full(tied, cap):
    nn = tied.shape[0]
    key = jnp.where(tied, jnp.arange(nn, dtype=I32), nn)
    (sk,) = jax.lax.sort((key,), num_keys=1)
    return sk[:cap], jnp.sum(tied.astype(I32))


tied_d = jax.device_put(tied_h)
o1 = timeit("extract_full", extract_full, tied_d, cap)
o2 = timeit("extract_blocked", extract_blocked, tied_d, cap, B)
a1 = np.asarray(o1[0])
a2 = np.asarray(o2[0])
print("equal:", np.array_equal(a1, a2), int(o1[1]), int(o2[1]), flush=True)
