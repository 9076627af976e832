"""Probe: is _resolve_ties scatter-bound or dispatch-bound?

Builds the 128 Mbp -RC device index with different rounds_per_call
settings and compares the doubling-phase laps.

Usage: ASGART_DEVICE_PROFILE=1 python scripts/ties_probe.py [MBP]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 128.0

from bench import synthetic_genome  # noqa: E402
from asgart_tpu.device_index import DeviceIndex  # noqa: E402

n = int(MBP * 1e6)
rng = np.random.default_rng(1234)
g = synthetic_genome(n, rng)
data = np.concatenate([g, np.frombuffer(b"$", dtype=np.uint8)])
codes = DeviceIndex.upload_codes(data)
np.asarray(codes[:1])
print("uploaded", flush=True)

for rpc in (2, 2, 6, 6):
    t0 = time.time()
    idx = DeviceIndex.build(data, 20, reverse=True, complement=True,
                            codes_device=codes, rounds_per_call=rpc)
    np.asarray(idx.sa[:1])
    print(f"rounds_per_call={rpc}: total {time.time()-t0:.2f}s",
          flush=True)
    del idx
