"""AGC ingestion: import-agc conversion + --agc driver wiring.

No real agc binary exists in this environment, so a stand-in script with the
same CLI surface (listset / getset / getcol) serves FASTA from a staging
directory — the conversion logic, BGZF store, indexing and driver wiring are
all exercised for real; only the AGC decompression itself is simulated.
"""
import gzip
import os
import stat
import sys

import numpy as np
import pytest

from impop_tpu.cli import main
from impop_tpu.extract.pyfallback import read_fasta
from impop_tpu.extract.simulate import simulate

FAKE_AGC = """#!{python}
import os, sys
root = os.path.dirname(os.path.abspath(__file__))
store = os.path.join(root, "agc_store")
cmd = sys.argv[1]
samples = sorted(os.listdir(store))
if cmd == "listset":
    for s in samples:
        print(os.path.splitext(s)[0])
elif cmd == "getset":
    want = sys.argv[3]
    with open(os.path.join(store, want + ".fa")) as fh:
        sys.stdout.write(fh.read())
elif cmd == "getcol":
    for s in samples:
        with open(os.path.join(store, s)) as fh:
            sys.stdout.write(fh.read())
else:
    sys.exit(2)
"""


@pytest.fixture
def fake_agc(tmp_path, monkeypatch):
    """A fake 'agc' on PATH + per-sample FASTAs staged from the simulator."""
    sim = simulate(str(tmp_path), ref_len=2000, n_haps=6, n_snps=8, seed=31,
                   span=(0, 2000))
    store = tmp_path / "agc_store"
    store.mkdir()
    seqs = read_fasta(sim.fasta_path)
    for name, seq in seqs.items():
        safe = name.replace("#", "_")
        with open(store / f"{safe}.fa", "w") as fh:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i:i + 60] + "\n")
    agc_bin = tmp_path / "agc"
    agc_bin.write_text(FAKE_AGC.format(python=sys.executable))
    agc_bin.chmod(agc_bin.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"])
    archive = tmp_path / "assemblies.agc"
    archive.write_bytes(b"AGC\x03fake")
    return sim, str(archive)


def test_import_agc_creates_readable_store(fake_agc, tmp_path):
    sim, archive = fake_agc
    out = str(tmp_path / "store.fa.gz")
    main(["import-agc", archive, "-o", out])
    assert os.path.exists(out)
    # the store is valid multi-member gzip and contains every sequence
    with gzip.open(out, "rt") as fh:
        names = {ln[1:].split()[0] for ln in fh if ln.startswith(">")}
    assert names == set(read_fasta(sim.fasta_path))


def test_import_agc_sample_subset_and_prefix(fake_agc, tmp_path):
    sim, archive = fake_agc
    listing = tmp_path / "names.txt"
    first = sorted(
        n.replace("#", "_") for n in read_fasta(sim.fasta_path)
    )[:2]
    listing.write_text("\n".join(first) + "\n")
    out = str(tmp_path / "subset.fa.gz")
    main(["import-agc", archive, "-o", out, "--samples", str(listing),
          "--prefix-sample"])
    with gzip.open(out, "rt") as fh:
        names = {ln[1:].split()[0] for ln in fh if ln.startswith(">")}
    assert len(names) == 2
    assert all("#" in n and n.split("#", 1)[0] in first for n in names)


def test_scan_with_agc_runs_natively(fake_agc, tmp_path):
    """scan --paf --agc: one-time conversion, then native extraction — the
    VERDICT item-1 contract (no external impg anywhere)."""
    sim, archive = fake_agc
    bed = tmp_path / "w.bed"
    bed.write_text("chr1\t0\t1000\nchr1\t1000\t2000\n")
    out = tmp_path / "scan.tsv"
    main(["scan", "-b", str(bed), "--paf", sim.paf_path, "--agc", archive,
          "-P", "CHM13#0#", "-o", str(out)])
    lines = [ln for ln in out.read_text().splitlines() if ln]
    assert len(lines) == 3
    row = lines[1].split("\t")
    assert int(row[2]) == 7          # 6 haplotypes + reference row
    assert int(row[3]) > 0           # segregating sites flowed through
    # the conversion is cached next to the archive
    assert os.path.exists(archive + ".impop.fa.gz")
    # second run reuses the cache (no mtime change)
    mtime = os.path.getmtime(archive + ".impop.fa.gz")
    main(["scan", "-b", str(bed), "--paf", sim.paf_path, "--agc", archive,
          "-P", "CHM13#0#", "-o", str(tmp_path / "scan2.tsv")])
    assert os.path.getmtime(archive + ".impop.fa.gz") == mtime


def test_pi_with_agc_matches_fasta_path(fake_agc, tmp_path):
    """pi --paf --agc == pi --paf --fasta (same windows, same table)."""
    sim, archive = fake_agc
    bed = tmp_path / "w.bed"
    bed.write_text("chr1\t0\t2000\n")
    out_a = tmp_path / "a.tsv"
    out_b = tmp_path / "b.tsv"
    main(["pi", "-b", str(bed), "--paf", sim.paf_path, "--agc", archive,
          "-P", "CHM13#0#", "-t", "0.999", "-o", str(out_a)])
    main(["pi", "-b", str(bed), "--paf", sim.paf_path,
          "--fasta", sim.fasta_path, "-P", "CHM13#0#", "-t", "0.999",
          "-o", str(out_b)])
    assert out_a.read_text() == out_b.read_text()


def test_import_agc_verify_roundtrip(fake_agc, tmp_path):
    """--verify md5-compares every sequence the archive emits against the
    converted store, and fails loudly when the store is corrupted."""
    sim, archive = fake_agc
    out = tmp_path / "store_v.fa.gz"
    main(["import-agc", str(archive), "-o", str(out), "--verify"])

    # corrupt one sequence in the store: rewrite with a flipped base
    import gzip as _gz

    from impop_tpu.io.bgzf import BgzfWriter

    text = _gz.open(out, "rt").read().splitlines()
    for i, line in enumerate(text):
        if not line.startswith(">") and line:
            text[i] = ("A" if line[0] != "A" else "C") + line[1:]
            break
    with open(out, "wb") as fh, BgzfWriter(fh) as bw:
        bw.write(("\n".join(text) + "\n").encode())

    from impop_tpu.extract.agc import verify_store

    with pytest.raises(RuntimeError, match="differ"):
        verify_store(str(archive), str(out))
