"""Two-channel output contract (SURVEY.md §5): every deep driver writes
per-window debug logs with the intermediate math (the reference's
<input>.log files, pica2.py:186-206 / h-fst.py:323-335), and end-of-run
success/error counters go to stderr (run_h-fst.sh:151-203)."""
import json

import numpy as np
import pytest

from impop_tpu.cli import main
from impop_tpu.extract.simulate import simulate


@pytest.fixture
def dataset(tmp_path):
    sim = simulate(str(tmp_path), ref_len=3000, n_haps=8, n_snps=10,
                   seed=3, span=(0, 3000))
    bed = tmp_path / "w.bed"
    bed.write_text("chr1\t0\t1500\nchr1\t1500\t3000\n")
    tiles = tmp_path / "tiles"
    main(["extract", "-b", str(bed), "--paf", sim.paf_path,
          "--fasta", sim.fasta_path, "--out-dir", str(tiles),
          "-P", "CHM13#0#", "--python"])
    names = sorted({str(n) for f in tiles.glob("*.npz")
                    for n in np.load(f)["names"]})
    half = [n for n in names if not n.startswith("CHM13")]
    pa = tmp_path / "panA.txt"
    pb = tmp_path / "panB.txt"
    pa.write_text("\n".join(half[:4]) + "\n")
    pb.write_text("\n".join(half[4:]) + "\n")
    return sim, bed, tiles, pa, pb


def _json_tail(path):
    return json.loads(path.read_text().splitlines()[-1])


def test_tajd_log_dir(dataset, tmp_path):
    sim, bed, tiles, pa, pb = dataset
    logs = tmp_path / "logs_tajd"
    out = tmp_path / "t.tsv"
    main(["tajd", "-b", str(bed), "--geno-dir", str(tiles), "-P", "CHM13#0#",
          "-o", str(out), "-d", str(logs)])
    files = sorted(logs.glob("*.log"))
    assert len(files) == 2
    payload = _json_tail(files[0])
    row = out.read_text().splitlines()[1].split("\t")
    assert payload["n"] == int(row[2])
    assert payload["segregating_sites"] == int(row[3])
    # the table quantises PI to 8 decimals; the log keeps full precision
    assert abs(payload["pi_per_site"] - float(row[4])) < 5e-9


def test_fst3pi_log_dir(dataset, tmp_path):
    sim, bed, tiles, pa, pb = dataset
    logs = tmp_path / "logs_f3"
    out = tmp_path / "f.tsv"
    main(["fst3pi", "-b", str(bed), "--geno-dir", str(tiles),
          "-P", "CHM13#0#", "-A", str(pa), "-B", str(pb),
          "--exact-names", "-o", str(out), "-d", str(logs)])
    files = sorted(logs.glob("*.log"))
    assert len(files) == 2
    payload = _json_tail(files[0])
    for key in ("pi_a", "pi_b", "pi_c", "pi_ab", "fst"):
        assert key in payload


def test_scan_log_dir_and_counters(dataset, tmp_path, capsys):
    sim, bed, tiles, pa, pb = dataset
    logs = tmp_path / "logs_scan"
    out = tmp_path / "s.tsv"
    main(["scan", "-b", str(bed), "--geno-dir", str(tiles), "-P", "CHM13#0#",
          "--panel", str(pa), "--panel", str(pb),
          "-o", str(out), "-d", str(logs)])
    err = capsys.readouterr().err
    assert "success: 2" in err and "errors: 0" in err
    files = sorted(logs.glob("*.log"))
    assert len(files) == 2
    payload = _json_tail(files[0])
    # intermediates for every panel and pair, matching the table row
    header = out.read_text().splitlines()[0].split("\t")
    row = out.read_text().splitlines()[1].split("\t")
    cols = dict(zip(header, row))
    assert payload["segregating_sites"] == int(cols["SEGREGATING_SITES"])
    for pname in ("panA", "panB"):
        assert abs(payload[f"pi_{pname}"] - float(cols[f"PI_{pname}"])) < 1e-8
    assert abs(payload["fst_panA_panB"] - float(cols["FST_panA_panB"])) < 1e-7
    assert "fstg_panA_panB" in payload and "fst3_panA_panB" in payload


def test_counters_count_failures(dataset, tmp_path, capsys):
    sim, bed, tiles, pa, pb = dataset
    bad_bed = tmp_path / "bad.bed"
    bad_bed.write_text("chr1\t0\t1500\nchr1\t999000\t999500\n")
    main(["pi", "-b", str(bad_bed), "--geno-dir", str(tiles),
          "-P", "CHM13#0#", "-o", str(tmp_path / "p.tsv")])
    err = capsys.readouterr().err
    assert "success: 1" in err and "errors: 1" in err
