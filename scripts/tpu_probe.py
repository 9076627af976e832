"""Measure TPU primitive costs through the axon tunnel: device_put
bandwidth, jit compile latency, gather throughput, sort throughput, and
lax.scan iteration rate. Informs the round-2 device-engine design."""
import time
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    t0 = time.time()
    devs = jax.devices()
    log(f"devices: {devs} ({time.time()-t0:.1f}s)")

    # tiny compile latency
    t0 = time.time()
    r = np.asarray(jax.jit(lambda x: x * 2 + 1)(jnp.arange(8)))
    log(f"tiny jit dispatch+compile+fetch: {time.time()-t0:.1f}s")

    # device_put bandwidth at several sizes
    for mb in (16, 128, 512):
        a = np.random.randint(0, 1 << 30, size=mb * 1024 * 1024 // 4,
                              dtype=np.int32)
        t0 = time.time()
        d = jax.device_put(a)
        np.asarray(d[:8])
        dt = time.time() - t0
        log(f"device_put {mb}MB: {dt:.2f}s = {mb/1024/dt:.2f} GB/s")
        del d

    # gather throughput: 128M-entry table, 4M random indices
    N = 128 * 1024 * 1024
    B = 4 * 1024 * 1024
    table = jax.device_put(np.arange(N, dtype=np.int32))
    idx = jax.device_put(
        np.random.randint(0, N, size=B).astype(np.int32))

    @jax.jit
    def g(t, i):
        return t[i]

    np.asarray(g(table, idx))  # warm + force round trip
    t0 = time.time()
    for _ in range(5):
        r = np.asarray(g(table, idx)[:8])
    dt = (time.time() - t0) / 5
    log(f"gather 4M from 128M: {dt*1e3:.1f}ms = {B/dt/1e6:.0f}M lookups/s")

    # sort throughput: 32M and 128M int32 pairs
    for n in (32 * 1024 * 1024, 128 * 1024 * 1024):
        k1 = jax.device_put(np.random.randint(
            0, 1 << 30, size=n, dtype=np.int32))
        k2 = jax.device_put(np.random.randint(
            0, 1 << 30, size=n, dtype=np.int32))
        v = jax.device_put(np.arange(n, dtype=np.int32))

        @jax.jit
        def srt(a, b, c):
            return jax.lax.sort((a, b, c), num_keys=2)

        np.asarray(srt(k1, k2, v)[2][:8])
        t0 = time.time()
        r = np.asarray(srt(k1, k2, v)[2][:8])
        dt = time.time() - t0
        log(f"lex sort {n//1024//1024}M (2 keys + 1 val int32): {dt:.2f}s")
        del k1, k2, v, r

    # scan step rate: trivial-state scan, 100K and 1M iterations
    for L in (100_000, 1_000_000):
        xs = jax.device_put(np.ones(L, dtype=np.int32))

        @jax.jit
        def sc(xs):
            def body(c, x):
                return c + x, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return c

        float(sc(xs))
        t0 = time.time()
        r = float(sc(xs))
        dt = time.time() - t0
        log(f"scan {L} trivial iters: {dt*1e3:.0f}ms = {dt/L*1e9:.0f}ns/iter")

    # scan with [M=512] x [A=256] per-step work (chain-like)
    L = 65536
    M, A = 512, 256
    ms = jax.device_put(np.random.randint(
        0, 1000, size=(L, M)).astype(np.int32))

    @jax.jit
    def sc2(ms):
        def body(carry, m):
            adm = (m[:, None] > carry[None, :])
            first = jnp.min(jnp.where(adm, jnp.arange(A, dtype=jnp.int32)[None, :], A), axis=1)
            carry = carry.at[jnp.clip(first, 0, A - 1)].add(1)
            return carry, ()
        c, _ = jax.lax.scan(body, jnp.zeros(A, jnp.int32), ms)
        return c

    np.asarray(sc2(ms))
    t0 = time.time()
    r = np.asarray(sc2(ms)[:8])
    dt = time.time() - t0
    log(f"scan {L} chain-like [512x256] iters: {dt*1e3:.0f}ms = "
        f"{dt/L*1e6:.1f}us/iter")

    log("probe done")


if __name__ == "__main__":
    main()
