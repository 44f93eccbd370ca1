"""SFS drivers: `sfs` subcommand + `scan --afs` (tile-native spectrum)."""
import numpy as np
import pytest

from impop_tpu.cli import main
from impop_tpu.extract.simulate import simulate


@pytest.fixture
def tiles(tmp_path):
    sim = simulate(str(tmp_path), ref_len=4000, n_haps=10, n_snps=16,
                   seed=19, span=(0, 4000))
    bed = tmp_path / "w.bed"
    bed.write_text("chr1\t0\t2000\nchr1\t2000\t4000\n")
    tdir = tmp_path / "tiles"
    main(["extract", "-b", str(bed), "--paf", sim.paf_path,
          "--fasta", sim.fasta_path, "--out-dir", str(tdir),
          "-P", "CHM13#0#", "--python"])
    return sim, bed, tdir


def _expected_folded_hist(tdir, max_n):
    """Hand-computed folded spectrum over all windows, all rows."""
    hist = np.zeros(max_n + 1, np.int64)
    for f in sorted(tdir.glob("*.npz")):
        g = np.load(f)["geno"]
        valid = g >= 0
        ones = np.where(valid, g, 0).sum(axis=0)
        total = valid.sum(axis=0)
        poly = (ones > 0) & (ones < total)
        minor = np.minimum(ones, total - ones)
        for k in minor[poly]:
            hist[k] += 1
    return hist


def _read_spectrum(path):
    hist = {}
    with open(path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            hist[int(parts[0])] = [int(x) for x in parts[1:]]
    return header, hist


def test_sfs_merged_matches_hand_computed(tiles, tmp_path):
    sim, bed, tdir = tiles
    out = tmp_path / "sfs.tsv"
    main(["sfs", "-b", str(bed), "--geno-dir", str(tdir), "-P", "CHM13#0#",
          "-o", str(out)])
    header, hist = _read_spectrum(out)
    assert header == ["ALLELE_COUNT", "SITES_ALL"]
    want = _expected_folded_hist(tdir, 128)
    for k, counts in hist.items():
        assert counts[0] == want[k], k
    assert sum(c[0] for c in hist.values()) == want.sum()


def test_sfs_per_window_and_panels(tiles, tmp_path):
    sim, bed, tdir = tiles
    names = sorted({n for f in tdir.glob("*.npz")
                    for n in np.load(f)["names"]})
    half = [n for n in names if not n.startswith("CHM13")][:5]
    panel = tmp_path / "panA.txt"
    panel.write_text("\n".join(half) + "\n")
    out = tmp_path / "sfs.tsv"
    pw = tmp_path / "perwin.tsv"
    main(["sfs", "-b", str(bed), "--geno-dir", str(tdir), "-P", "CHM13#0#",
          "--panel", str(panel), "-o", str(out), "--per-window", str(pw)])
    header, hist = _read_spectrum(out)
    assert header == ["ALLELE_COUNT", "SITES_panA"]
    # per-window rows sum to the merged spectrum
    sums = {}
    with open(pw) as fh:
        fh.readline()
        for line in fh:
            region, pname, k, c = line.rstrip("\n").split("\t")
            assert pname == "panA"
            sums[int(k)] = sums.get(int(k), 0) + int(c)
    assert sums == {k: v[0] for k, v in hist.items() if v[0]}
    # a 5-hap panel folds at 2 (minor allele count <= n/2)
    assert all(k <= 2 for k in hist)


def test_scan_afs_matches_sfs_and_survives_resume(tiles, tmp_path):
    sim, bed, tdir = tiles
    sfs_out = tmp_path / "sfs.tsv"
    main(["sfs", "-b", str(bed), "--geno-dir", str(tdir), "-P", "CHM13#0#",
          "-o", str(sfs_out)])

    afs_out = tmp_path / "afs.tsv"
    journal = tmp_path / "j.jsonl"
    main(["scan", "-b", str(bed), "--geno-dir", str(tdir), "-P", "CHM13#0#",
          "-o", str(tmp_path / "scan.tsv"), "--afs", str(afs_out),
          "--journal", str(journal)])
    _, got = _read_spectrum(afs_out)
    _, want = _read_spectrum(sfs_out)
    assert {k: v[0] for k, v in got.items() if v[0]} == \
           {k: v[0] for k, v in want.items() if v[0]}

    # resume: all rows come from the journal, spectrum must be identical
    afs2 = tmp_path / "afs2.tsv"
    main(["scan", "-b", str(bed), "--geno-dir", str(tdir), "-P", "CHM13#0#",
          "-o", str(tmp_path / "scan2.tsv"), "--afs", str(afs2),
          "--journal", str(journal)])
    assert afs2.read_text() == afs_out.read_text()
