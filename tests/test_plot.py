"""Plot toolchain: all five plotters render valid SVG / Circos files."""

import io
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from asgart_tpu.cli import plot as plot_cli
from asgart_tpu.exporters import JSONExporter
from asgart_tpu.structs import (RunResult, RunSettings, SD, Start,
                                StrandResult)


@pytest.fixture
def result_file(tmp_path):
    strand = StrandResult(name="g.fa", length=30_000_000, map=[
        Start("chr1", 0, 20_000_000), Start("chr2", 20_000_000, 10_000_000)])
    fams = [
        [SD("chr1", "chr1", 1_000_000, 5_000_000, 1_000_000, 5_000_000,
            150_000, 150_000)],
        [SD("chr1", "chr2", 8_000_000, 22_000_000, 8_000_000, 2_000_000,
            120_000, 120_000, reversed=True, complemented=True)],
    ]
    r = RunResult(strand=strand, settings=RunSettings(), families=fams)
    p = tmp_path / "r.json"
    buf = io.StringIO()
    JSONExporter().save(r, buf)
    p.write_text(buf.getvalue())
    return p


@pytest.mark.parametrize("kind", ["flat", "chord", "genome"])
def test_svg_plots_render(tmp_path, result_file, kind, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / f"plot_{kind}"
    rc = plot_cli.main([str(result_file), "--out", str(out),
                        "--min-length", "1000", kind])
    assert rc == 0
    svg_file = str(out) + ".svg"
    content = open(svg_file).read()
    # well-formed XML with duplication geometry present
    root = ET.fromstring(content)
    assert root.tag.endswith("svg")
    assert "title" in content  # hover tooltips
    assert "1 000 000" in content or "8 000 000" in content


def test_rosary_plot(tmp_path, result_file, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "plot_rosary"
    rc = plot_cli.main([str(result_file), "--out", str(out),
                        "rosary", "--clustering", "10000", "--rosary"])
    assert rc == 0
    content = open(str(out) + ".svg").read()
    root = ET.fromstring(content)
    assert root.tag.endswith("svg")
    assert "#ff5b00" in content  # direct span
    assert "#00b2ae" in content  # RC span
    assert "Duplications-devoid regions" in content


def test_circos_output(tmp_path, result_file, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "plot_circos"
    rc = plot_cli.main([str(result_file), "--out", str(out), "circos"])
    assert rc == 0
    kar = open(str(out) + ".karyotype").read()
    assert "chr - chr1 chr1 0 20000000 grey" in kar
    links = open(str(out) + ".links").read()
    assert "color=orange" in links and "color=teal" in links
    conf = open(str(out) + ".conf").read()
    assert "karyotype =" in conf


def test_filters_and_colorizers(tmp_path, result_file, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "f"
    rc = plot_cli.main([str(result_file), "--out", str(out), "--no-direct",
                        "--colorize", "by-fragment", "flat"])
    assert rc == 0
    content = open(str(out) + ".svg").read()
    # only the RC duplicon remains; its left arm is on chr1
    assert content.count("<polygon") == 1


def test_feature_track_and_proximity_filters(tmp_path, result_file,
                                             monkeypatch):
    monkeypatch.chdir(tmp_path)
    feat = tmp_path / "features.txt"
    feat.write_text("geneA;chr1+990000;30000\n"
                    "geneB;25000000;10000\n")
    out = tmp_path / "ff"
    rc = plot_cli.main([str(result_file), "--out", str(out),
                        "--features", str(feat),
                        "--filter-duplicons", "100000", "flat"])
    assert rc == 0
    content = open(str(out) + ".svg").read()
    # only the direct duplicon near geneA survives
    assert content.count("<polygon") >= 1
    assert "geneA" in content


def test_gff3_feature_track(tmp_path, result_file, monkeypatch):
    monkeypatch.chdir(tmp_path)
    gff = tmp_path / "track.gff3"
    gff.write_text("##gff-version 3.2.1\n"
                   "chr1\tsrc\tgene\t990000\t1020000\t.\t+\t.\t"
                   "ID=g1;Name=GENE1\n")
    out = tmp_path / "fg"
    rc = plot_cli.main([str(result_file), "--out", str(out),
                        "--features", str(gff), "chord"])
    assert rc == 0
    assert "GENE1" in open(str(out) + ".svg").read()
