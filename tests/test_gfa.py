"""GFA import: odgi-similarity / povu-gfa2vcf capability parity.

The exporter (window_to_gfa) and importer (alleles_from_gfa) must round-trip:
matrix -> graph -> matrix is the identity on clean (non-overlapping,
fully-covered) windows.  similarity_from_gfa must emit the
group.a/group.b/estimated.identity header pica2.py:22-27 requires.
"""
import numpy as np
import pytest

from impop_tpu.extract import WindowMatrix
from impop_tpu.extract.gfa import (
    alleles_from_gfa,
    path_segment_matrix,
    read_gfa,
    similarity_from_gfa,
    window_to_gfa,
)


def _mk_matrix():
    # 3 haplotypes, SNP at 105, insertion at 112, deletion at 120-122
    names = ["HG1#1#c0:0-40", "HG2#1#c1:0-40", "HG3#2#c2:0-40"]
    ref_seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    site_keys = ["105:C>T", "112:>GGA", "120:ACG>"]
    site_pos = np.array([105, 112, 120], dtype=np.int64)
    geno = np.array(
        [[1, 0, 1],
         [0, 1, 0],
         [1, 0, 1]], dtype=np.int8)
    wm = WindowMatrix(names, site_keys, site_pos, geno)
    return wm, ref_seq, 100, "CHM13#0#chr9"


def test_roundtrip_matrix_gfa_matrix():
    wm, ref_seq, start, ref_name = _mk_matrix()
    text = window_to_gfa(wm, ref_seq, start, ref_name)
    g = read_gfa(text)
    wm2, ref_path = alleles_from_gfa(g)
    assert ref_path == f"{ref_name}:{start}-{start + len(ref_seq)}"
    assert wm2.names == wm.names
    assert wm2.site_keys == wm.site_keys
    np.testing.assert_array_equal(wm2.geno, wm.geno)
    np.testing.assert_array_equal(wm2.site_pos, wm.site_pos)


def test_roundtrip_simulated_window(tmp_path):
    from impop_tpu.extract.pyfallback import PyExtractor, fetch_fasta_window
    from impop_tpu.extract.simulate import simulate

    sim = simulate(str(tmp_path), ref_len=3000, n_haps=8, n_snps=5,
                   seed=11, span=(0, 3000))
    ex = PyExtractor(sim.paf_path, sim.fasta_path)
    start, end = 50, 2950
    wm = ex.extract(sim.ref_name, start, end)
    ref_seq = fetch_fasta_window(sim.fasta_path, sim.ref_name, start, end)
    g = read_gfa(window_to_gfa(wm, ref_seq, start, sim.ref_name))
    wm2, _ = alleles_from_gfa(g)

    # the reference's own row coincides with the GFA backbone path and is
    # excluded from the re-imported haplotype rows
    ref_row = f"{sim.ref_name}:{start}-{end}"
    hap_rows = [r for r, n in enumerate(wm.names) if n != ref_row]
    assert wm2.names == [wm.names[r] for r in hap_rows]
    # exporter keeps the non-overlapping position-sorted variant subset;
    # reconstruct which columns survived
    surviving = [k for k in wm.site_keys if k in set(wm2.site_keys)]
    assert wm2.site_keys == surviving and len(surviving) >= 3
    col_old = {k: c for c, k in enumerate(wm.site_keys)}
    for c2, key in enumerate(wm2.site_keys):
        old = np.where(wm.geno[np.ix_(hap_rows, [col_old[key]])][:, 0] == 1,
                       1, 0)  # -1 walks as ref
        np.testing.assert_array_equal(wm2.geno[:, c2], old)


def test_similarity_from_gfa_contract():
    wm, ref_seq, start, ref_name = _mk_matrix()
    g = read_gfa(window_to_gfa(wm, ref_seq, start, ref_name))
    header, rows = similarity_from_gfa(g)
    for col in ("group.a", "group.b", "estimated.identity"):
        assert col in header
    ident = {(r[header.index("group.a")], r[header.index("group.b")]):
             float(r[header.index("estimated.identity")]) for r in rows}
    names = sorted(g.paths)
    # self similarity is exactly 1
    for n in names:
        assert ident[(n, n)] == pytest.approx(1.0)
    # identical walks (rows 0 and 2 carry the same variants) are identity 1
    a, b = sorted(["HG1#1#c0:0-40", "HG3#2#c2:0-40"])
    assert ident[(a, b)] == pytest.approx(1.0)
    # different walks are < 1
    a, b = sorted(["HG1#1#c0:0-40", "HG2#1#c1:0-40"])
    assert ident[(a, b)] < 1.0


def test_walk_lines_and_revcomp():
    # GFA 1.1 W lines with a reverse-orientation step
    text = "\n".join([
        "S\t1\tACGT",
        "S\t2\tTT",
        "S\t3\tAA",
        "W\tCHM13\t0\tchr1\t0\t6\t>1>2",
        "W\tHG1\t1\tctg\t0\t6\t>1<3",   # <3 == revcomp(AA) == TT ... no: AA
    ]) + "\n"
    g = read_gfa(text)
    assert set(g.paths) == {"CHM13#0#chr1", "HG1#1#ctg"}
    assert g.paths["HG1#1#ctg"] == [("1", "+"), ("3", "-")]
    assert g.step_seq(("3", "-")) == "TT"
    wm, ref = alleles_from_gfa(g, ref_path="CHM13#0#chr1")
    # revcomp(AA)=TT equals the reference allele TT -> no variant
    assert wm.site_keys == []


def test_path_segment_matrix_shapes():
    wm, ref_seq, start, ref_name = _mk_matrix()
    g = read_gfa(window_to_gfa(wm, ref_seq, start, ref_name))
    counts, seg_len, names, seg_ids = path_segment_matrix(g)
    assert counts.shape == (len(g.paths), len(g.seg_seq))
    assert (seg_len > 0).all()
    total = {n: g.path_length(n) for n in names}
    got = (counts * seg_len[None, :]).sum(axis=1)
    for r, n in enumerate(names):
        assert got[r] == total[n]


def test_gfa_cli_subcommands(tmp_path, capsys):
    from impop_tpu.cli import main

    wm, ref_seq, start, ref_name = _mk_matrix()
    gfa_path = tmp_path / "win.gfa"
    gfa_path.write_text(window_to_gfa(wm, ref_seq, start, ref_name))

    assert main(["gfasim", str(gfa_path)]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0].split("\t")[:2] == ["group.a", "group.b"]

    assert main(["gfa2vcf", str(gfa_path)]) == 0
    out = capsys.readouterr().out
    records = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert len(records) == 3  # S = segregating sites = variant columns


def test_gfa_dir_pi_matches_geno_dir(tmp_path):
    """pi --gfa-dir == pi --geno-dir on the same window."""
    from impop_tpu.cli import main

    wm, ref_seq, start, ref_name = _mk_matrix()
    region = f"{ref_name}:{start}-{start + len(ref_seq)}"
    safe = region.replace("#", "_").replace(":", "_").replace("-", "_")
    gdir = tmp_path / "geno"; gdir.mkdir()
    fdir = tmp_path / "gfa"; fdir.mkdir()
    # real extraction tiles include the reference's own all-zero row; the
    # GFA import adds the backbone path to match (include_ref_row)
    geno_ref = np.vstack([np.zeros((1, wm.geno.shape[1]), np.int8), wm.geno])
    np.savez_compressed(gdir / f"{safe}.npz", geno=geno_ref,
                        names=np.asarray([region] + wm.names))
    (fdir / f"{safe}.gfa").write_text(
        window_to_gfa(wm, ref_seq, start, ref_name))
    bed = tmp_path / "w.bed"
    bed.write_text(f"chr9\t{start}\t{start + len(ref_seq)}\n")

    out_a = tmp_path / "a.tsv"; out_b = tmp_path / "b.tsv"
    common = ["pi", "-b", str(bed), "-P", "CHM13#0#", "-t", "0.999"]
    assert main(common + ["--geno-dir", str(gdir), "-o", str(out_a)]) == 0
    assert main(common + ["--gfa-dir", str(fdir), "-o", str(out_b)]) == 0
    assert out_a.read_text() == out_b.read_text()
    assert "0" in out_a.read_text()


# ------------------------------------------------- adversarial graph shapes


def test_w_line_start_offset_sets_genomic_positions():
    """odgi-style W lines with non-zero seqStart: variant positions come out
    in GENOMIC coordinates (the start was previously dropped)."""
    gfa = "\n".join([
        "H\tVN:Z:1.1",
        "S\t1\tAAAA",
        "S\t2\tC",
        "S\t3\tT",
        "S\t4\tGGGG",
        # reference walk covers chr1[5000, 5009)
        "W\tCHM13\t0\tchr1\t5000\t5009\t>1>2>4",
        "W\tHG1\t1\tc0\t0\t9\t>1>3>4",
    ])
    g = read_gfa(gfa)
    assert g.path_start["CHM13#0#chr1"] == 5000
    wm, ref = alleles_from_gfa(g, ref_path="CHM13#0#chr1")
    assert ref == "CHM13#0#chr1"
    assert wm.site_keys == ["5004:C>T"]
    assert wm.names == ["HG1#1#c0"]
    np.testing.assert_array_equal(wm.geno, [[1]])


def test_nested_bubble_variant_call():
    """A bubble inside a bubble: the inner variation folds into one variant
    region between the outer anchors (anchor-chain semantics)."""
    gfa = "\n".join([
        "H\tVN:Z:1.0",
        "S\t1\tAAAA",        # anchor
        "S\t2\tCC",          # outer ref branch part 1
        "S\t3\tG",           # inner bubble ref
        "S\t4\tT",           # inner bubble alt
        "S\t5\tCC",          # outer branch part 2
        "S\t6\tTTTT",        # anchor
        "S\t7\tAGAGA",       # outer alt branch (whole replacement)
        "P\tCHM13#0#chr2:100-112\t1+,2+,3+,5+,6+\t*",
        "P\thapInner\t1+,2+,4+,5+,6+\t*",   # inner bubble alt only
        "P\thapOuter\t1+,7+,6+\t*",         # outer replacement
    ])
    g = read_gfa(gfa)
    wm, _ = alleles_from_gfa(g, ref_path="CHM13#0#chr2:100-112")
    got = dict(zip(wm.names, map(tuple, wm.geno)))
    # inner: ref CCGCC vs CCTCC -> trimmed SNP G>T at 104+2
    assert "106:G>T" in wm.site_keys
    # outer: ref CCGCC vs AGAGA at 104
    assert "104:CCGCC>AGAGA" in wm.site_keys
    i_inner = wm.site_keys.index("106:G>T")
    i_outer = wm.site_keys.index("104:CCGCC>AGAGA")
    assert got["hapInner"][i_inner] == 1 and got["hapInner"][i_outer] == 0
    assert got["hapOuter"][i_outer] == 1 and got["hapOuter"][i_inner] == 0


def test_inversion_calls_revcomp_substitution():
    """A '-' oriented traversal of a reference segment is an inversion: the
    region between anchors differs by reverse complement and must surface
    as a substitution variant with the revcomp alt."""
    gfa = "\n".join([
        "H\tVN:Z:1.0",
        "S\t1\tAAAA",
        "S\t2\tACGGT",
        "S\t3\tTTTT",
        "P\tCHM13#0#chr3:0-13\t1+,2+,3+\t*",
        "P\thapInv\t1+,2-,3+\t*",
    ])
    g = read_gfa(gfa)
    wm, _ = alleles_from_gfa(g, ref_path="CHM13#0#chr3:0-13")
    assert wm.names == ["hapInv"]
    # revcomp(ACGGT) = ACCGT; shared prefix AC and suffix GT trim away,
    # leaving the G>C core of the inversion at position 4+2
    assert wm.site_keys == ["6:G>C"]
    np.testing.assert_array_equal(wm.geno, [[1]])


def test_odgi_style_numeric_graph_with_offset_walks():
    """An odgi-normalised shape: numeric ids, W lines with offsets, several
    haplotypes sharing bubbles — S equals the distinct variant count and
    the gfa2vcf CLI agrees."""
    import io
    from contextlib import redirect_stdout

    from impop_tpu.cli import main

    gfa = "\n".join([
        "H\tVN:Z:1.1",
        "S\t1\tACGTACGT",
        "S\t2\tA",
        "S\t3\tG",
        "S\t4\tCCCC",
        "S\t5\tTT",
        "S\t6\tGGGGGGGG",
        "W\tCHM13\t0\tchr4\t2000\t2022\t>1>2>4>5>6",
        "W\tHG1\t1\tc1\t0\t22\t>1>3>4>5>6",    # SNP A>G at 2008
        "W\tHG2\t1\tc2\t0\t20\t>1>2>4>6",      # deletion TT at 2013
        "W\tHG3\t2\tc3\t0\t22\t>1>3>4>5>6",    # same SNP as HG1
    ])
    g = read_gfa(gfa)
    wm, ref = alleles_from_gfa(g, ref_path="CHM13#0#chr4")
    assert set(wm.site_keys) == {"2008:A>G", "2013:TT>"}
    got = dict(zip(wm.names, wm.geno))
    snp = wm.site_keys.index("2008:A>G")
    dele = wm.site_keys.index("2013:TT>")
    assert got["HG1#1#c1"][snp] == 1 and got["HG1#1#c1"][dele] == 0
    assert got["HG2#1#c2"][dele] == 1 and got["HG2#1#c2"][snp] == 0
    assert got["HG3#2#c3"][snp] == 1

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "w.gfa")
        with open(path, "w") as fh:
            fh.write(gfa + "\n")
        buf = io.StringIO()
        with redirect_stdout(buf):
            main(["gfa2vcf", path, "--ref", "CHM13#0#chr4"])
        records = [l for l in buf.getvalue().splitlines()
                   if l and not l.startswith("#")]
        assert len(records) == 2  # S == distinct variants (povu contract)
        assert records[0].split("\t")[0] == "CHM13#0#chr4"
