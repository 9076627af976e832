"""Shared test helpers: synthetic genomes, brute-force oracles."""

from __future__ import annotations

import numpy as np


def random_dna(rng: np.random.Generator, n: int,
               alphabet: bytes = b"ACGT") -> bytes:
    return bytes(rng.choice(np.frombuffer(alphabet, dtype=np.uint8), size=n))


def mutate(rng: np.random.Generator, seq: bytes, rate: float) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    mask = rng.random(len(arr)) < rate
    repl = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                      size=int(mask.sum()))
    arr[mask] = repl
    return arr.tobytes()


def revcomp(seq: bytes) -> bytes:
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")
    return seq.translate(comp)[::-1]


def plant_duplication(rng: np.random.Generator, n: int, dup_len: int,
                      pos1: int, pos2: int, noise: float = 0.0,
                      transform=None) -> bytes:
    """Random genome of length n with seq[pos2:] ≈ transform(seq[pos1:])."""
    g = bytearray(random_dna(rng, n))
    dup = bytes(g[pos1: pos1 + dup_len])
    if noise:
        dup = mutate(rng, dup, noise)
    if transform:
        dup = transform(dup)
    g[pos2: pos2 + dup_len] = dup
    return bytes(g)


def brute_force_matches(text: bytes, pattern: bytes) -> set[int]:
    """All exact occurrence positions of pattern in text."""
    out = set()
    start = 0
    while True:
        idx = text.find(pattern, start)
        if idx < 0:
            return out
        out.add(idx)
        start = idx + 1


def write_fasta(path, records: list[tuple[str, bytes]], width: int = 60):
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            s = seq.decode()
            for i in range(0, len(s), width):
                f.write(s[i: i + width] + "\n")
