"""IO contracts: similarity TSV, BED windows, region strings."""
import io

import numpy as np

from impop_tpu.io.bed import Region, make_windows, parse_region, read_bed
from impop_tpu.io.simtsv import read_similarity_tsv, round_half_even


def test_read_similarity_tsv_basic():
    text = (
        "group.a\tgroup.b\testimated.identity\n"
        "b#1#\ta#1#\t0.9991\n"
        "a#1#\tc#1#\t0.9985\n"
        "b#1#\tc#1#\t1.0\n"
    )
    sm = read_similarity_tsv(io.StringIO(text))
    assert sm.names == ["a#1#", "b#1#", "c#1#"]
    assert sm.pair_count == 3
    idx = sm.index()
    assert sm.sim[idx["a#1#"], idx["b#1#"]] == 0.9991
    assert sm.sim[idx["b#1#"], idx["a#1#"]] == 0.9991
    assert sm.present.all()  # 3 pairs + diagonal = full 3x3
    np.testing.assert_array_equal(np.diag(sm.sim), 1.0)


def test_read_similarity_tsv_missing_pairs_and_duplicates():
    text = (
        "group.a\tgroup.b\testimated.identity\n"
        "a\tb\t0.5\n"
        "a\tb\t0.7\n"  # duplicate: last wins (reference dict assignment)
        "c\td\t0.9\n"
    )
    sm = read_similarity_tsv(io.StringIO(text))
    idx = sm.index()
    assert sm.sim[idx["a"], idx["b"]] == 0.7
    assert not sm.present[idx["a"], idx["c"]]
    assert sm.pair_count == 3


def test_round_half_even_matches_python_round():
    vals = [0.99905, 0.99915, 0.123455, 0.123465, 0.9999949999]
    for v in vals:
        for d in (3, 4, 5):
            assert round_half_even(np.array([v]), d)[0] == round(v, d), (v, d)


def test_region_string_prefix_dedup():
    # reference run_pica2_impg.sh:139-151
    r = Region("chr1", 100, 300)
    assert r.region_string("CHM13#0#") == "CHM13#0#chr1:100-300"
    r2 = Region("CHM13#0#chr1", 100, 300)
    assert r2.region_string("CHM13#0#") == "CHM13#0#chr1:100-300"
    assert r.region_string("") == "chr1:100-300"


def test_parse_region_roundtrip():
    r = parse_region("CHM13#0#chr1:158341439-158341639")
    assert r.chrom == "CHM13#0#chr1"
    assert r.start == 158341439 and r.end == 158341639
    assert r.length == 200


def test_make_windows():
    wins = make_windows("chr1", 0, 1000, 300)
    assert [(w.start, w.end) for w in wins] == [(0, 300), (300, 600),
                                               (600, 900), (900, 1000)]


def test_read_bed(tmp_path):
    p = tmp_path / "r.bed"
    p.write_text(
        "# comment\n"
        "chr1\t100\t300\n"
        "chr1\t300\t300\n"       # non-positive length: skipped
        "chr2\tx\t500\n"         # non-integer: skipped
        "chr2\t0\t500\tname1\n"
        "\n"
    )
    regions = read_bed(p)
    assert len(regions) == 2
    assert regions[0] == Region("chr1", 100, 300)
    assert regions[1] == Region("chr2", 0, 500, "name1")
