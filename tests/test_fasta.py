import numpy as np

from asgart_tpu.fasta import find_chunks_to_process, prepare_data, read_fasta
from tests.util import write_fasta


def chunks(s: bytes):
    return find_chunks_to_process(np.frombuffer(s, dtype=np.uint8))


def test_chunks_plain():
    assert chunks(b"ACGT" * 100) == [(0, 400)]


def test_chunks_split_at_big_n_run():
    s = b"A" * 100 + b"N" * 5001 + b"C" * 200
    assert chunks(s) == [(0, 100), (5101, 200)]


def test_chunks_small_n_run_included():
    s = b"A" * 100 + b"N" * 5000 + b"C" * 200
    assert chunks(s) == [(0, 5300)]


def test_chunks_leading_and_trailing_ns():
    s = b"N" * 6000 + b"A" * 100
    assert chunks(s) == [(6000, 100)]
    s = b"A" * 100 + b"N" * 6000
    assert chunks(s) == [(0, 100)]
    s = b"N" * 6000
    assert chunks(s) == [(0, 6000)]
    s = b"N" * 100 + b"A" * 50
    assert chunks(s) == [(0, 150)]


def test_chunks_empty():
    assert chunks(b"") == [(0, 0)]


def test_read_fasta_normalization(tmp_path):
    p = tmp_path / "x.fa"
    write_fasta(p, [("chr1 extra description", b"acgtRYKM"),
                    ("chr2", b"ACGTN")])
    fmap, seq = read_fasta(str(p), skip_masked=False)
    assert [s.name for s in fmap] == ["chr1", "chr2"]
    assert [(s.position, s.length) for s in fmap] == [(0, 8), (8, 5)]
    assert seq.tobytes() == b"ACGTNNNNACGTN"


def test_read_fasta_skip_masked(tmp_path):
    p = tmp_path / "x.fa"
    write_fasta(p, [("c", b"acgtACGTn")])
    _, seq = read_fasta(str(p), skip_masked=True)
    assert seq.tobytes() == b"NNNNACGTN"


def test_prepare_data_multifile(tmp_path):
    p1 = tmp_path / "a.fa"
    p2 = tmp_path / "b.fa"
    write_fasta(p1, [("c1", b"ACGT" * 10)])
    write_fasta(p2, [("c2", b"TTTT" * 5), ("c3", b"GG")])
    trim, to_process, strand = prepare_data(
        [str(p1), str(p2)], False, None)
    assert trim is None
    assert [s.name for s in strand.map] == ["c1", "c2", "c3"]
    assert [(s.position, s.length) for s in strand.map] == \
        [(0, 40), (40, 20), (60, 2)]
    # chunks never cross fragments
    assert to_process == [(0, 40), (40, 20), (60, 2)]
    assert strand.data[-1] == ord("$")
    assert len(strand.data) == 63


def test_prepare_data_trim_clamping(tmp_path):
    p = tmp_path / "a.fa"
    write_fasta(p, [("c", b"ACGT" * 25)])  # 100bp + '$' = 101
    trim, _, _ = prepare_data([str(p)], False, (0, 2000))
    assert trim == (0, 100)  # stop clamped to len-1
    trim, _, _ = prepare_data([str(p)], False, (50, 20))
    assert trim is None  # stop <= shift
    trim, _, _ = prepare_data([str(p)], False, (500, 600))
    assert trim is None  # clamped stop(100) <= shift(500)
    trim, _, _ = prepare_data([str(p)], False, (10, 90))
    assert trim == (10, 90)


def test_header_with_only_whitespace():
    """A '>' header followed by whitespace must parse as an empty name
    (ADVICE r1: used to raise IndexError)."""
    import tempfile, os
    from asgart_tpu.fasta import read_fasta
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.fa")
        with open(p, "w") as fh:
            fh.write("> \nACGT\n>chr2\nGGGG\n")
        map_, total = read_fasta(p, skip_masked=False)
        assert [m.name for m in map_] == ["", "chr2"]
        assert total.tobytes() == b"ACGTGGGG"


def test_read_fasta_real_world_quirks(tmp_path):
    """Ragged multiFASTA as produced by real tools: CRLF endings, ragged
    line widths within one record, blank lines between records, tab-
    separated header descriptions, a zero-length record, and the full
    IUPAC ambiguity set (mapped to N like the reference's
    any-non-ACGTN rule, asgart.rs:291-301)."""
    p = tmp_path / "ragged.fa"
    with open(p, "wb") as fh:
        fh.write(b">chr1\tassembly=GRCh38\tlen=ragged\r\n")
        fh.write(b"ACGTACGTAC\r\n")       # width 10
        fh.write(b"gtRYSWKMBDHVacn\r\n")  # width 15, soft-masked + IUPAC
        fh.write(b"\r\n")                 # blank line inside the record
        fh.write(b"AC\r\n")               # width 2
        fh.write(b">empty_rec\r\n")       # zero-length record
        fh.write(b">chr2 plain description\n")
        fh.write(b"ACGT\nACGTN\n\n")      # mixed widths + trailing blank
    fmap, seq = read_fasta(str(p), skip_masked=False)
    assert [s.name for s in fmap] == ["chr1", "empty_rec", "chr2"]
    assert [(s.position, s.length) for s in fmap] == \
        [(0, 27), (27, 0), (27, 9)]
    # chr1: uppercase + every non-ACGT byte -> N
    assert seq[:27].tobytes() == b"ACGTACGTACGTNNNNNNNNNNACNAC"
    assert seq[27:].tobytes() == b"ACGTACGTN"

    # skip-masked: soft-masked (lowercase) bases -> N instead
    _, seq_m = read_fasta(str(p), skip_masked=True)
    assert seq_m[:27].tobytes() == b"ACGTACGTACNNNNNNNNNNNNNNNAC"

    bad = tmp_path / "headerless.fa"
    bad.write_bytes(b"ACGTACGT\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_fasta(str(bad), skip_masked=False)


def test_prepare_cache_hit_and_invalidation(tmp_path):
    """prepare_data's warm-service parse cache: identical results on a
    hit (same object is fine — callers are read-only), trim validation
    still per-call, and a file rewrite (mtime/size) invalidates."""
    import os
    import time as _time

    from asgart_tpu.fasta import prepare_data

    fa = tmp_path / "g.fa"
    fa.write_bytes(b">c1\nACGTACGTAC\nGGGG\n")
    t1 = prepare_data([str(fa)], False, None)
    t2 = prepare_data([str(fa)], False, (2, 8))
    assert t2[0] == (2, 8)  # trim computed on the cached parse
    assert np.array_equal(t1[2].data, t2[2].data)
    assert t1[1] == t2[1]
    # out-of-range trim on a cache hit still clamps with a warning
    t3 = prepare_data([str(fa)], False, (2, 99))
    assert t3[0] == (2, len(t1[2].data) - 1)
    # rewrite -> new content must be parsed
    _time.sleep(0.01)
    fa.write_bytes(b">c1\nTTTTTTTTTT\nCCCC\n")
    os.utime(fa)
    t4 = prepare_data([str(fa)], False, None)
    assert not np.array_equal(t1[2].data, t4[2].data)
    # skip_masked is part of the key
    t5 = prepare_data([str(fa)], True, None)
    assert t5[2].data is not t4[2].data
