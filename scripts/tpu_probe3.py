"""Second-round TPU primitive probe: 256M sorts, scans (cumsum),
scatters, device->host download bandwidth, int8 handling."""
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

    log(f"devices: {jax.devices()}")

    # download bandwidth
    for mb in (16, 128):
        d = jax.device_put(np.zeros(mb * 1024 * 1024 // 4, dtype=np.int32))
        np.asarray(d[:8])
        t0 = time.time()
        a = np.asarray(d)
        dt = time.time() - t0
        log(f"download {mb}MB: {dt:.2f}s = {mb/1024/dt:.2f} GB/s")
        del d, a

    n = 256 * 1024 * 1024
    # 256M 2-key sort
    k1 = jax.device_put(np.random.randint(0, 1 << 30, n, dtype=np.int32))
    k2 = jax.device_put(np.random.randint(0, 1 << 30, n, dtype=np.int32))

    @jax.jit
    def srt(a, b):
        return jax.lax.sort((a, b, jnp.arange(a.shape[0], dtype=jnp.int32)),
                            num_keys=2)

    np.asarray(srt(k1, k2)[2][:8])
    t0 = time.time()
    np.asarray(srt(k1, k2)[2][:8])
    log(f"sort 256M 2key+val: {time.time()-t0:.2f}s")

    # 256M cumsum (int32)
    @jax.jit
    def cs(a):
        return jnp.cumsum(a.astype(jnp.int32))

    ones = jax.device_put(np.ones(n, dtype=np.int8))
    np.asarray(cs(ones)[:8])
    t0 = time.time()
    np.asarray(cs(ones)[:8])
    log(f"cumsum 256M: {time.time()-t0:.2f}s")

    # cummax via associative_scan
    @jax.jit
    def cm(a):
        return jax.lax.associative_scan(jnp.maximum, a)

    np.asarray(cm(k1)[:8])
    t0 = time.time()
    np.asarray(cm(k1)[:8])
    log(f"cummax(assoc_scan) 256M: {time.time()-t0:.2f}s")

    # scatter 12.8M random int32 into 256M
    B = 12_800_000
    idx = jax.device_put(np.random.randint(0, n, B).astype(np.int32))
    vals = jax.device_put(np.arange(B, dtype=np.int32))

    @jax.jit
    def scat(tgt, i, v):
        return tgt.at[i].set(v)

    tgt = jax.device_put(np.zeros(n, dtype=np.int32))
    np.asarray(scat(tgt, idx, vals)[:8])
    t0 = time.time()
    np.asarray(scat(tgt, idx, vals)[:8])
    log(f"scatter 12.8M into 256M: {time.time()-t0:.2f}s")

    # gather 12.8M from 1G-entry... (doubled tables are [2n,2]); 12.8M row
    # gather from a [256M, 2] array
    tab = jax.device_put(np.zeros((n // 2, 2), dtype=np.int32))

    @jax.jit
    def rowg(t, i):
        return t[i]

    idx2 = jax.device_put(np.random.randint(0, n // 2, B).astype(np.int32))
    np.asarray(rowg(tab, idx2)[:8])
    t0 = time.time()
    np.asarray(rowg(tab, idx2)[:8])
    log(f"row-gather 12.8M from [128M,2]: {time.time()-t0:.2f}s")

    # 13 chained gathers of 12.8M (binary-search-like dependency)
    big = jax.device_put(np.random.randint(0, B, n // 2).astype(np.int32))

    @jax.jit
    def chaing(t, i):
        x = i
        for _ in range(13):
            x = t[x] % t.shape[0]
        return x

    np.asarray(chaing(big, idx2)[:8])
    t0 = time.time()
    np.asarray(chaing(big, idx2)[:8])
    log(f"13 chained gathers 12.8M from 128M: {time.time()-t0:.2f}s")

    log("probe3 done")


if __name__ == "__main__":
    main()
