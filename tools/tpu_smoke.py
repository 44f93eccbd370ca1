"""On-chip production-path smoke: the REAL scan CLI on the REAL backend.

The CPU test suite runs every semantic differential, but Mosaic compiles
are backend-specific — a kernel variant that only ever compiled in
interpret mode can still CHECK-crash on hardware.  This driver runs the
actual `scan` CLI end-to-end on the attached accelerator at shapes the
headline bench does NOT cover, and (for the non-disjoint case) compares
against the CPU path on the same pangenome:

1. cap-256 tiles (200 haplotypes) with --ehh: the whole-window kernel
   (ops/windowstat.py), the EHH death kernel (ops/ehhdeath.py) and the
   wire focal segment at a non-headline shape.
2. OVERLAPPING panels: the non-disjoint kernel variant (extra stripped-
   side mask rows, different static row layout), TPU-vs-CPU differential
   on every emitted column (<= 2e-3, the documented Fst budget).

Run after touching any Mosaic kernel:  python tools/tpu_smoke.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main() -> int:
    from impop_tpu.extract.simulate import simulate

    import impop_tpu.cli as cli

    # ---- 1: cap-256 + --ehh
    tmp = tempfile.mkdtemp(prefix="tpu_smoke_")
    sim = simulate(tmp, ref_len=250_000, n_haps=200, site_pool=4000,
                   seed=31, span=(0, 250_000))
    bed = os.path.join(tmp, "w.bed")
    with open(bed, "w") as fh:
        for lo in range(0, 250_000, 5000):
            fh.write(f"chr1\t{lo}\t{lo + 5000}\n")
    ents = sorted({h.name.split("#")[0] for h in sim.haplotypes})
    for pname, sl in (("PA", ents[:30]), ("PB", ents[30:60]),
                      ("PC", ents[60:90])):
        with open(os.path.join(tmp, f"agc.{pname}"), "w") as fh:
            fh.write("\n".join(sl) + "\n")
    out = os.path.join(tmp, "scan.tsv")
    cli.main(["scan", "-b", bed, "--paf", sim.paf_path,
              "--fasta", sim.fasta_path, "-P", "CHM13#0#",
              "--panel", os.path.join(tmp, "agc.PA"),
              "--panel", os.path.join(tmp, "agc.PB"),
              "--panel", os.path.join(tmp, "agc.PC"),
              "--ehh", "--batch", "25", "-o", out])
    lines = open(out).read().splitlines()
    assert len(lines) == 51, len(lines)
    hdr = lines[0].split("\t")
    import math
    for ln in lines[1:]:
        cells = ln.split("\t")
        assert len(cells) == len(hdr)
        float(cells[hdr.index("EHH_AREA_REF")])
        int(cells[hdr.index("EHH_CARR_ALT")])
        assert not math.isnan(float(cells[4]))
    print("tpu_smoke 1 OK: cap-256 + --ehh, 50 windows", flush=True)

    # ---- 2: overlapping panels (non-disjoint kernel), TPU vs CPU
    tmp2 = tempfile.mkdtemp(prefix="tpu_smoke_nd_")
    sim2 = simulate(tmp2, ref_len=100_000, n_haps=60, site_pool=1500,
                    seed=41, span=(0, 100_000))
    bed2 = os.path.join(tmp2, "w.bed")
    with open(bed2, "w") as fh:
        for lo in range(0, 100_000, 5000):
            fh.write(f"chr1\t{lo}\t{lo + 5000}\n")
    ents2 = sorted({h.name.split("#")[0] for h in sim2.haplotypes})
    for pname, sl in (("PA", ents2[:20]), ("PB", ents2[10:30])):
        with open(os.path.join(tmp2, f"agc.{pname}"), "w") as fh:
            fh.write("\n".join(sl) + "\n")
    out_t = os.path.join(tmp2, "scan_tpu.tsv")
    cli.main(["scan", "-b", bed2, "--paf", sim2.paf_path,
              "--fasta", sim2.fasta_path, "-P", "CHM13#0#",
              "--panel", os.path.join(tmp2, "agc.PA"),
              "--panel", os.path.join(tmp2, "agc.PB"),
              "--batch", "20", "-o", out_t])
    out_c = os.path.join(tmp2, "scan_cpu.tsv")
    env = dict(os.environ, IMPOP_TPU_PLATFORM="cpu")
    rc = subprocess.run(
        [sys.executable, "-m", "impop_tpu.cli", "scan", "-b", bed2,
         "--paf", sim2.paf_path, "--fasta", sim2.fasta_path,
         "-P", "CHM13#0#", "--panel", os.path.join(tmp2, "agc.PA"),
         "--panel", os.path.join(tmp2, "agc.PB"),
         "--batch", "20", "-o", out_c],
        env=env, cwd=os.path.dirname(_HERE)).returncode
    assert rc == 0
    rows_t = [l.split("\t") for l in open(out_t).read().splitlines()[1:]]
    rows_c = [l.split("\t") for l in open(out_c).read().splitlines()[1:]]
    worst = 0.0
    for ra, rb in zip(rows_t, rows_c):
        assert ra[0] == rb[0]
        for ca, cb in zip(ra[1:], rb[1:]):
            if ca == "NA" or cb == "NA":
                assert ca == cb, (ra[0], ca, cb)
                continue
            d = abs(float(ca) - float(cb))
            worst = max(worst, d)
            assert d <= 2e-3, (ra[0], ca, cb)
    print(f"tpu_smoke 2 OK: non-disjoint TPU==CPU "
          f"(max abs diff {worst:.2e})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
