import numpy as np
import pytest

from asgart_tpu.index import GenomeIndex, pack_kmer
from tests.util import brute_force_matches, random_dna


def build(text: bytes, k: int, trim=None) -> GenomeIndex:
    data = np.frombuffer(text, dtype=np.uint8)
    return GenomeIndex.build(data, k, trim=trim)


@pytest.mark.parametrize("seed,n,k", [(0, 300, 8), (1, 2000, 20),
                                      (2, 5000, 20), (3, 1000, 12)])
def test_search_matches_bruteforce(seed, n, k):
    rng = np.random.default_rng(seed)
    text = random_dna(rng, n, b"ACGTN") + b"$"
    idx = build(text, k)
    for _ in range(100):
        p = int(rng.integers(0, n - k))
        pattern = text[p: p + k]
        got = set(idx.search(pattern))
        want = brute_force_matches(text, pattern)
        assert got == want


def test_search_order_is_suffix_order():
    # positions with the same k-mer must come back in suffix order
    text = b"ACGTACGTTACGTA" * 20 + b"$"
    idx = build(text, 4)
    matches = idx.search(b"ACGT")
    suffixes = [text[m:] for m in matches]
    assert suffixes == sorted(suffixes)
    assert set(matches) == brute_force_matches(text, b"ACGT")


def test_pattern_with_sentinel_region_never_matches():
    text = b"ACGTACGA" + b"$"
    idx = build(text, 5)
    # pattern "CGA??" would need to read past the end; suffix "CGA$" is
    # shorter than the pattern → no match (searcher.rs:164-170)
    assert idx.search(b"CGACG") == []


def test_trim_index_covers_window_only():
    rng = np.random.default_rng(9)
    body = random_dna(rng, 500, b"ACGT")
    text = body + body + b"$"  # exact duplication at +500
    k = 10
    idx = build(text, k, trim=(0, 500))
    pattern = body[100:110]
    got = set(idx.search(pattern))
    want = {m for m in brute_force_matches(text, pattern) if m < 500}
    # window-interior matches only (positions ≥ window end excluded)
    assert got == want


def test_pack_kmer_order_matches_bytes():
    # packed order must equal byte-lexicographic order on equal-length kmers
    rng = np.random.default_rng(3)
    kmers = [random_dna(rng, 6, b"ACGTN") for _ in range(200)]
    packed = np.array([pack_kmer(p) for p in kmers])
    order = np.argsort(packed, kind="stable")
    assert [kmers[i] for i in order] == sorted(kmers)
