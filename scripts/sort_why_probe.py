"""Why is _flagged_sort (3-op, num_keys=2, donated) ~1.4s while a
generic 3-op num_keys=1 sort is ~2.4s at 256M rows? Isolate: num_keys,
iota payload, donation."""
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

I32 = jnp.int32
n = 256_000_001
rng = np.random.default_rng(0)
k1_h = rng.integers(0, 1 << 30, n, dtype=np.int32)
k2_h = rng.integers(0, 1 << 30, n, dtype=np.int32)
p_h = rng.integers(0, n, n, dtype=np.int32)


@jax.jit
def dup(x):
    return x * 1


k1 = jax.device_put(k1_h)
k2 = jax.device_put(k2_h)
p = jax.device_put(p_h)


def bench(name, fn, mkargs, reps=4):
    ts = []
    for i in range(reps):
        a = mkargs()
        for x in a:
            np.asarray(x.ravel()[:1])
        t0 = time.time()
        out = fn(*a)
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        if i:
            ts.append(time.time() - t0)
    print(f"{name}: {min(ts):.3f}s ({['%.3f' % t for t in ts]})", flush=True)


@jax.jit
def s3_k1(a, b, c):
    return jax.lax.sort((a, b, c), num_keys=1)


@jax.jit
def s3_k2(a, b, c):
    return jax.lax.sort((a, b, c), num_keys=2)


@jax.jit
def s3_k2_iota(a, b):
    nn = a.shape[0]
    return jax.lax.sort((a, b, jnp.arange(nn, dtype=I32)), num_keys=2)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def s3_k2_iota_don(a, b):
    nn = a.shape[0]
    return jax.lax.sort((a, b, jnp.arange(nn, dtype=I32)), num_keys=2)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def s3_k1_iota_don(a, b):
    nn = a.shape[0]
    return jax.lax.sort((a, b, jnp.arange(nn, dtype=I32)), num_keys=1)


bench("3op k=1 (rand payloads)", s3_k1, lambda: (k1, k2, p))
bench("3op k=2 (rand payload)", s3_k2, lambda: (k1, k2, p))
bench("3op k=2 iota payload", s3_k2_iota, lambda: (k1, k2))
bench("3op k=2 iota donated", s3_k2_iota_don, lambda: (dup(k1), dup(k2)))
bench("3op k=1 iota donated", s3_k1_iota_don, lambda: (dup(k1), dup(k2)))
