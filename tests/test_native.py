import numpy as np
import pytest

from asgart_tpu import native
from tests.util import random_dna


def naive_suffix_array(text: bytes) -> list[int]:
    return sorted(range(len(text)), key=lambda i: text[i:])


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 2), (2, 50), (3, 200),
                                    (4, 1000), (5, 4096)])
def test_sais_random(seed, n):
    rng = np.random.default_rng(seed)
    text = random_dna(rng, n, b"ACGTN") + b"$"
    sa = native.suffix_array(text)
    assert sa.tolist() == naive_suffix_array(text)


def test_sais_repetitive():
    for text in [b"AAAAAAAA$", b"ABABABAB$", b"ACGTACGTACGT$",
                 b"A$", b"$", b"NNNNACGTNNNN$"]:
        sa = native.suffix_array(text)
        assert sa.tolist() == naive_suffix_array(text), text


def test_sais_low_complexity_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(30):
        n = int(rng.integers(2, 400))
        text = random_dna(rng, n, b"AC") + b"$"
        sa = native.suffix_array(text)
        assert sa.tolist() == naive_suffix_array(text)


def python_levenshtein(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[len(b)]


def test_levenshtein():
    assert native.levenshtein(b"", b"") == 0
    assert native.levenshtein(b"ACGT", b"ACGT") == 0
    assert native.levenshtein(b"ACGT", b"") == 4
    assert native.levenshtein(b"", b"ACG") == 3
    rng = np.random.default_rng(7)
    for _ in range(20):
        a = random_dna(rng, int(rng.integers(0, 60)))
        b = random_dna(rng, int(rng.integers(0, 60)))
        assert native.levenshtein(a, b) == python_levenshtein(a, b)


def test_kmer_suffix_sort_matches_sais():
    from asgart_tpu.index import CODE
    rng = np.random.default_rng(11)
    for trial in range(12):
        n = int(rng.integers(5, 3000))
        alpha = [b"ACGT", b"AC", b"ACGTN", b"A"][trial % 4]
        text = random_dna(rng, n, alpha) + b"$" + random_dna(rng, n // 2, alpha)
        data = np.frombuffer(text, dtype=np.uint8)
        k = [4, 8, 20][trial % 3]
        kmers = native.pack_kmers(CODE[data], k)
        got = native.kmer_suffix_sort(kmers, k, n_threads=3)
        want = native.suffix_array(data)
        np.testing.assert_array_equal(got, want)


def test_kmer_suffix_sort_repetitive():
    from asgart_tpu.index import CODE
    # long runs force many doubling rounds
    text = b"A" * 5000 + b"ACGT" * 100 + b"$" + b"T" * 3000
    data = np.frombuffer(text, dtype=np.uint8)
    kmers = native.pack_kmers(CODE[data], 20)
    got = native.kmer_suffix_sort(kmers, 20, n_threads=4)
    want = native.suffix_array(data)
    np.testing.assert_array_equal(got, want)
