from asgart_tpu.structs import (RunResult, RunSettings, SD, Start,
                                StrandResult, COLLAPSED_NAME)


def sd(cl, cr, gl, gr, cll, crl, ll=1000, rl=1000, rev=False, comp=False):
    return SD(chr_left=cl, chr_right=cr, global_left_position=gl,
              global_right_position=gr, chr_left_position=cll,
              chr_right_position=crl, left_length=ll, right_length=rl,
              reversed=rev, complemented=comp)


def make_result():
    strand = StrandResult(name="t", length=30000, map=[
        Start("A", 0, 10000), Start("B", 10000, 10000),
        Start("C", 20000, 10000)])
    fams = [
        [sd("A", "A", 100, 5000, 100, 5000),
         sd("A", "B", 200, 12000, 200, 2000, rev=True)],
        [sd("B", "C", 11000, 25000, 1000, 5000, comp=True)],
        [sd("C", "C", 21000, 22000, 1000, 2000, rev=True, comp=True)],
    ]
    return RunResult(strand=strand, settings=RunSettings(), families=fams)


def test_remove_direct_reversed():
    r = make_result()
    r.remove_direct()
    assert all(s.reversed for f in r.families for s in f)
    assert len(r.families) == 2
    r = make_result()
    r.remove_reversed()
    assert all(not s.reversed for f in r.families for s in f)


def test_remove_inter_intra():
    r = make_result()
    r.remove_inter()
    assert all(s.chr_left == s.chr_right for f in r.families for s in f)
    assert len(r.families) == 2
    r = make_result()
    r.remove_intra()
    assert all(s.chr_left != s.chr_right for f in r.families for s in f)
    assert len(r.families) == 2


def test_max_family_members():
    r = make_result()
    r.max_family_members(1)
    assert all(len(f) <= 1 for f in r.families)
    assert len(r.families) == 2


def test_keep_fragments_rebases_coordinates():
    r = make_result()
    r.keep_fragments(["B", "C"])
    # family 1 keeps the A-B duplicon (one leg on B)
    assert [s.name for s in r.strand.map] == ["B", "C"]
    assert r.strand.length == 20000
    assert [s.position for s in r.strand.map] == [0, 10000]
    all_sds = [s for f in r.families for s in f]
    ab = [s for s in all_sds if s.chr_left == "A"][0]
    assert ab.global_left_position == 0  # A missing → map_or(0)
    assert ab.global_right_position == 2000  # B now at 0
    bc = [s for s in all_sds if s.chr_left == "B"][0]
    assert bc.global_left_position == 1000
    assert bc.global_right_position == 10000 + 5000


def test_restrict_fragments():
    r = make_result()
    r.restrict_fragments(["A"])
    assert len(r.families) == 1
    assert len(r.families[0]) == 1
    assert r.families[0][0].chr_right == "A"


def test_exclude_fragments():
    r = make_result()
    r.exclude_fragments(["A"])
    all_sds = [s for f in r.families for s in f]
    assert all("A" not in (s.chr_left, s.chr_right) for s in all_sds)
    assert [s.name for s in r.strand.map] == ["B", "C"]
    bc = [s for s in all_sds if s.chr_left == "B"][0]
    assert bc.global_left_position == 1000
    assert bc.global_right_position == 10000 + 5000


def test_keep_fragments_regexp():
    r = make_result()
    r.keep_fragments_regexp("^[BC]$")
    assert [s.name for s in r.strand.map] == ["B", "C"]


def test_flatten_collapses_small_named_fragments():
    strand = StrandResult(name="t", length=0, map=[
        Start("chr1", 0, 100000),
        Start("scaffold_1", 100000, 200),
        Start("scaffold_2", 100200, 300)])
    strand.length = 100500
    fams = [[sd("scaffold_1", "chr1", 100050, 500, 50, 500)]]
    r = RunResult(strand=strand, settings=RunSettings(), families=fams)
    r.flatten()
    names = [s.name for s in r.strand.map]
    assert names == ["chr1", COLLAPSED_NAME]
    collapsed = r.strand.map[-1]
    assert collapsed.length == 500
    assert collapsed.position == 100000 + 1  # reference quirk: +1
    s = r.families[0][0]
    assert s.chr_left == COLLAPSED_NAME
    assert s.chr_left_position == 50 + 100000  # rebased into collapsed space


def test_from_files_merging(tmp_path):
    import io
    from asgart_tpu.exporters import JSONExporter

    r1 = make_result()
    r2 = make_result()
    for i, r in enumerate([r1, r2]):
        buf = io.StringIO()
        JSONExporter().save(r, buf)
        (tmp_path / f"r{i}.json").write_text(buf.getvalue())
    merged = RunResult.from_files(
        [str(tmp_path / "r0.json"), str(tmp_path / "r1.json")])
    assert len(merged.families) == 6
    assert merged.strand.name == "t"
