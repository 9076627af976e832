"""Why does the window build's `_pack_planes_all` lap read 5.6 s at
W=256M when the table build's identical-shape pack laps 0.17 s?

Times the pack standalone, plus `_window_codes` and the initial sort,
at window scale. Usage: python scripts/pack_probe.py [MROWS]
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
W = MROWS * 1_000_000 + 1
k = 20


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


from asgart_tpu.device_index import (_initial_sort, _pack_planes_all,
                                     _window_codes)  # noqa: E402

rng = np.random.default_rng(0)
codes_small = jax.device_put(
    rng.integers(1, 5, W + k, dtype=np.uint8))  # already device-resident
np.asarray(codes_small[:1])

timeit("pack_planes_all W=256M+1", _pack_planes_all, codes_small, k, W)

win = timeit("window_codes (slice+pad) ", _window_codes,
             codes_small, jnp.int32(0), W - 1, k)
timeit("pack after window_codes  ", _pack_planes_all, win, k, W)


def sort_pair(kh, kl):
    return _initial_sort(kh + 0, kl + 0)  # +0: keep inputs (donation)


kh, kl = _pack_planes_all(codes_small, k, W)
np.asarray(kh[:1])
timeit("initial sort W rows      ", sort_pair, kh, kl)
