"""Real-chip validation sweep: host vs tpu CLI byte-equality on a
genome with planted duplications AND a satellite block (exercises the
sliced dispatch on hardware), direct and -RC, plus a --trim run.
Runs the CLI in-process: one backend claim serves every engine run
(killed/extra clients poison the relay's pool claim).

Usage: python scripts/chip_validate.py [MBP]   (default 8 Mbp — small
enough that per-shape compiles through the relay stay minutes, big
enough to cross MIN_CAP capacities). ASGART_VALIDATE_CPU=1 forces the
CPU backend (smoke mode).
"""
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

if os.environ.get("ASGART_VALIDATE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0


def main():
    from tests.util import random_dna, revcomp

    n = int(MBP * 1e6)
    rng = np.random.default_rng(4242)
    g = bytearray(random_dna(rng, n, b"ACGT"))
    # plain + RC duplications
    g[n // 2: n // 2 + 20000] = bytes(g[10000:30000])
    g[3 * n // 4: 3 * n // 4 + 15000] = revcomp(bytes(g[40000:55000]))
    # satellite block (raw-match explosion -> sliced dispatch)
    unit = random_dna(rng, 40, b"ACGT")
    sat = (unit * ((n // 20) // 40))[: n // 20]
    g[n // 3: n // 3 + len(sat)] = sat
    # N-run chunk split
    g[n // 5: n // 5 + 6000] = b"N" * 6000

    from asgart_tpu.cli.main import main as cli_main

    with tempfile.TemporaryDirectory() as d:
        fa = os.path.join(d, "genome.fa")
        with open(fa, "w") as fh:
            fh.write(">chr1\n" + bytes(g).decode() + "\n")

        def run(tag, extra):
            out = {}
            for eng in ("host", "tpu"):
                path = os.path.join(d, f"{tag}-{eng}.json")
                t0 = time.time()
                rc = cli_main([fa, "--engine", eng, "--out", path]
                              + extra)
                assert rc in (0, None), f"{tag}/{eng}: rc={rc}"
                print(f"{tag}/{eng}: {time.time()-t0:.1f}s", flush=True)
                out[eng] = open(path, "rb").read()
            assert out["host"] == out["tpu"], f"{tag}: JSON differs!"
            print(f"{tag}: byte-equal ({len(out['host'])} bytes)",
                  flush=True)

        run("direct", [])
        run("rc", ["-R", "-C"])
        run("trim", ["--trim", str(n // 4), str(3 * n // 4)])
    print("chip_validate: ALL BYTE-EQUAL", flush=True)


if __name__ == "__main__":
    main()
