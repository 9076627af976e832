"""Profile the device path on a CHUNK-HEAVY genome (real genomes split
into dozens of chunks at >5000 bp N-runs; synthetic bench genomes have
one). Usage: ASGART_DEVICE_PROFILE=1 python scripts/dscan_chunks_profile.py
[MBP] [N_RUNS]
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

MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 256.0
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 40

from bench import synthetic_genome  # noqa: E402
from asgart_tpu.fasta import Strand, find_chunks_to_process  # noqa: E402
from asgart_tpu.structs import RunSettings, Start  # noqa: E402
from asgart_tpu.pipeline import _DeviceEngineAdapter  # noqa: E402
from asgart_tpu.device_index import DeviceIndex  # noqa: E402

n = int(MBP * 1e6)
rng = np.random.default_rng(1234)
g = synthetic_genome(n, rng)
for i in range(N_RUNS):
    p = int((i + 1) * n / (N_RUNS + 1))
    g[p: p + 6000] = ord("N")
data = np.concatenate([g, np.frombuffer(b"$", dtype=np.uint8)])
strand = Strand(file_names="bench", data=data, map=[Start("chr1", 0, n)])
chunks = find_chunks_to_process(g)
settings = RunSettings(reverse=True, complement=True)
print(f"{len(chunks)} chunks", flush=True)

codes = DeviceIndex.upload_codes(data)
np.asarray(codes[:1])

for p in range(3):
    t0 = time.time()
    dev = _DeviceEngineAdapter(strand, settings, codes_device=codes)
    ti = time.time() - t0
    t0 = time.time()
    fams = []
    for part in dev.run_chunks(chunks):
        fams.extend(part)
    ts = time.time() - t0
    print(f"pass {p}: index {ti:.2f}s scan {ts:.2f}s "
          f"-> {n/1e6/(ti+ts):.2f} Mbp/s, "
          f"{sum(len(f) for f in fams)} SDs", flush=True)
    del dev
