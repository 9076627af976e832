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
