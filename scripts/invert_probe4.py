"""Is int div/mod-by-10 the 0.67 s? Measure elementwise dec variants and
the fused sort with an exact two-part division (no int32 mulhi).

p // 10 for p < 2^28, exactly, without integer division:
  hi = p >> 14; lo = p & 16383; t = 4*hi + lo   (p = 10*1638*hi + t)
  q2 = floor(f32(t) * 0.1f)  -- exact for t < 2^17 (error < 0.002,
                                fractional parts are multiples of 0.1)
  p // 10 = 1638*hi + q2 ;  p % 10 = t - 10*q2
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


def dec_fast(p):
    hi = p >> 14
    lo = p & 16383
    t = 4 * hi + lo
    q2 = jnp.floor(t.astype(jnp.float32) * jnp.float32(0.1)).astype(I32)
    q = 1638 * hi + q2
    r = t - 10 * q2
    return r * C + q


@jax.jit
def e_div(p):
    return (p % step) * C + p // step


@jax.jit
def e_fast(p):
    return dec_fast(p)


d1 = timeit("elementwise dec (div)  ", e_div, sa_ext)
d2 = timeit("elementwise dec (2part)", e_fast, sa_ext)
np.testing.assert_array_equal(np.asarray(d1[:4096]), np.asarray(d2[:4096]))
np.testing.assert_array_equal(np.asarray(d1[-4096:]),
                              np.asarray(d2[-4096:]))
print("2part exact on sampled rows", flush=True)


@jax.jit
def s_fused_fast(sa_e, lo_e, hi_e):
    dec = dec_fast(sa_e)
    _, pos_lo, pos_hi = jax.lax.sort((dec, lo_e, hi_e), num_keys=1)
    rank = pos_lo & jnp.int32(0x7FFFFFFF)
    return pos_lo, pos_hi, rank


timeit("fused-dec(2part) sort+rank", s_fused_fast, sa_ext, a_ext, b_ext)

# full-domain exactness of the trick
host = np.arange(0, L, 997, dtype=np.int32)
hv = jax.device_put(host)
np.testing.assert_array_equal(
    np.asarray(jax.jit(dec_fast)(hv)),
    (host % step).astype(np.int64) * C + host // step)
print("2part exact on strided full domain", flush=True)
