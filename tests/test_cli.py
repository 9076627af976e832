"""CLI surface tests: asgart / asgart-slice / asgart-extract flows."""

import json
import os

import numpy as np
import pytest

from asgart_tpu.cli import extract as extract_cli
from asgart_tpu.cli import main as main_cli
from asgart_tpu.cli import slice as slice_cli
from tests.util import plant_duplication, revcomp, write_fasta


@pytest.fixture
def genome(tmp_path):
    rng = np.random.default_rng(42)
    g = bytearray(plant_duplication(rng, 16000, 1500, 2000, 9000,
                                    noise=0.005))
    seg = bytes(g[4000:5200])
    g[12000:13200] = revcomp(seg)
    p = tmp_path / "genome.fa"
    write_fasta(p, [("chr1", bytes(g))])
    return p


def test_main_cli_default_output_name(genome, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main_cli.main([str(genome)]) == 0
    # default name: stems joined + mode suffix (none for direct)
    assert os.path.exists("genome.json")
    data = json.load(open("genome.json"))
    assert data["settings"]["probe_size"] == 20
    assert data["settings"]["max_gap_size"] == 120  # gap 100 + probe 20
    assert len(data["families"]) >= 1

    assert main_cli.main([str(genome), "-R", "-C"]) == 0
    assert os.path.exists("genome_RC.json")
    rc = json.load(open("genome_RC.json"))
    sds = [sd for fam in rc["families"] for sd in fam]
    assert any(sd["reversed"] and sd["complemented"] for sd in sds)


def test_main_cli_trim_suffix(genome, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main_cli.main([str(genome), "--trim", "0", "10000"]) == 0
    assert os.path.exists("genome_0-10000.json")
    data = json.load(open("genome_0-10000.json"))
    assert data["settings"]["trim"] == [0, 10000]


def test_slice_cli_merge_and_filters(genome, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    main_cli.main([str(genome), "--out", "a.json"])
    main_cli.main([str(genome), "-R", "-C", "--out", "b.json"])

    # merge both, drop direct → only RC duplicons remain
    assert slice_cli.main(["a.json", "b.json", "--no-direct",
                           "-o", "merged.json"]) == 0
    merged = json.load(open("merged.json"))
    sds = [sd for fam in merged["families"] for sd in fam]
    assert sds and all(sd["reversed"] for sd in sds)

    # gff3 to stdout
    assert slice_cli.main(["a.json", "--format", "gff3"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("##gff-version 3.2.1")
    assert "ASGART\tSD" in out

    # min-length uses min of arm lengths (slice semantics)
    assert slice_cli.main(["a.json", "--min-length", "10000",
                           "-o", "none.json"]) == 0
    assert json.load(open("none.json"))["families"] == []


def test_extract_cli_dump_and_in_place(genome, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # extract re-finds FASTAs as <location>/<name>: use a relative name
    main_cli.main(["genome.fa", "-R", "-C", "--out", "rc.json"])
    os.makedirs("fams", exist_ok=True)
    assert extract_cli.main(["rc.json", "-l", ".",
                             "-D", "-d", "fams"]) == 0
    fa = open("fams/family-0.fa").read()
    lines = fa.strip().split("\n")
    # right arm is un-reverse-complemented: sequences must be similar
    seq1, seq2 = lines[1], lines[3]
    same = sum(a == b for a, b in zip(seq1, seq2))
    assert same / len(seq1) > 0.95
    assert ";duplicon:0-1;" in lines[0] and ";duplicon:0-2;" in lines[2]

    assert extract_cli.main(["rc.json", "-l", ".", "-I"]) == 0
    data = json.load(open("rc.json"))
    sd = data["families"][0][0]
    assert sd["left_seq"] and sd["right_seq"]
    assert len(sd["left_seq"]) == sd["left_length"]


def test_extract_requires_mode(genome, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    main_cli.main([str(genome), "--out", "x.json"])
    assert extract_cli.main(["x.json"]) == 1  # neither -I nor -D


def test_checkpoint_resume(genome, tmp_path, monkeypatch):
    """Interrupted runs resume from the chunk journal with identical
    output."""
    import io

    from asgart_tpu.exporters import JSONExporter
    from asgart_tpu.pipeline import search_duplications
    from asgart_tpu.structs import RunSettings

    monkeypatch.chdir(tmp_path)
    settings = RunSettings()
    plain = search_duplications(["genome.fa"], settings)

    ck = str(tmp_path / "run.ckpt")
    first = search_duplications(["genome.fa"], settings, checkpoint=ck)
    assert os.path.exists(ck)
    # rerun: all chunks restored from the journal
    again = search_duplications(["genome.fa"], settings, checkpoint=ck)

    def dump(r):
        buf = io.StringIO()
        JSONExporter().save(r, buf)
        return buf.getvalue()

    assert dump(first) == dump(plain) == dump(again)

    # different settings invalidate the journal
    other = search_duplications(
        ["genome.fa"], RunSettings(probe_size=16), checkpoint=ck)
    assert dump(other) != ""  # ran fresh without crashing


def test_profile_timings(genome, tmp_path, monkeypatch):
    from asgart_tpu.pipeline import search_duplications
    from asgart_tpu.structs import RunSettings

    monkeypatch.chdir(tmp_path)
    prof = {}
    search_duplications(["genome.fa"], RunSettings(), profile=prof)
    assert set(prof) >= {"prepare_s", "index_s", "scan_s", "post_s",
                         "total_s"}
    assert prof["total_s"] > 0
