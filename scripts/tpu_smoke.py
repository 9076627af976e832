"""Real-TPU smoke + timing of the device engine: staged sizes, with
equality check against the host engine at the small size."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    log(f"devices: {jax.devices()}")

    from asgart_tpu.device_index import DeviceIndex
    from asgart_tpu.fasta import Strand, find_chunks_to_process
    from asgart_tpu.pipeline import (SearchEngine, _DeviceEngineAdapter)
    from asgart_tpu.structs import RunSettings, Start

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synthetic_genome

    sizes = [float(x) for x in
             os.environ.get("SMOKE_SIZES", "8,32").split(",")]
    passes = int(os.environ.get("SMOKE_PASSES", "1"))
    for mbp in sizes:
        n = int(mbp * 1e6)
        rng = np.random.default_rng(1234)
        g = synthetic_genome(n, rng)
        data = np.concatenate([g, np.frombuffer(b"$", dtype=np.uint8)])
        strand = Strand(file_names="bench", data=data,
                        map=[Start("chr1", 0, n)])
        chunks = find_chunks_to_process(g)
        settings = RunSettings(reverse=True, complement=True)

        for p in range(passes):
            t0 = time.time()
            dev = _DeviceEngineAdapter(strand, settings)
            t_index = time.time() - t0
            t0 = time.time()
            fams_dev = []
            for part in dev.run_chunks(chunks):
                fams_dev.extend(part)
            t_scan = time.time() - t0
            n_dev = sum(len(f) for f in fams_dev)
            log(f"[{mbp:.0f} Mbp pass {p}] device: index {t_index:.2f}s "
                f"scan {t_scan:.2f}s -> {mbp/(t_index+t_scan):.1f} Mbp/s, "
                f"{n_dev} SDs")
            del dev

        if mbp <= 8:
            t0 = time.time()
            se = SearchEngine(strand, settings, None, engine="host")
            th_i = time.time() - t0
            t0 = time.time()
            fams_host = []
            for c in chunks:
                fams_host.extend(se.run_chunk(c))
            th_s = time.time() - t0
            n_host = sum(len(f) for f in fams_host)
            log(f"[{mbp:.0f} Mbp] host:   index {th_i:.2f}s scan "
                f"{th_s:.2f}s -> {mbp/(th_i+th_s):.1f} Mbp/s, "
                f"{n_host} SDs")
            same = ([[vars(s_) for s_ in f] for f in fams_dev] ==
                    [[vars(s_) for s_ in f] for f in fams_host])
            log(f"[{mbp:.0f} Mbp] EQUAL: {same}")
            if not same:
                log("MISMATCH — aborting")
                return

    log("smoke done")


if __name__ == "__main__":
    main()
