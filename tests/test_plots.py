"""Reference R-script round-trip: the reference's own plot_*_trend.R
scripts must be able to read our output tables unchanged (the schema
contract claimed in report/tables.py:1-14; parser at reference
plot_pi_trend.R:190-229).

Rscript + ggplot2 do not exist in the build environment (see
doc/how_stats.md "Verification blocked by environment"), so these tests
are skipif-guarded and execute automatically wherever R is installed.
The tables fed to R are produced by report/tables.py row formatters —
the exact code paths the CLIs emit through.
"""
import os
import shutil
import subprocess

import pytest

from impop_tpu.report.tables import (HFST_HEADER, TAJD_HEADER,
                                     format_pica_output, hfst_row,
                                     pi_table_header, pi_row, tajd_row)

REF_SCRIPTS = "/root/reference/scripts"
HAVE_RSCRIPT = shutil.which("Rscript") is not None
needs_r = pytest.mark.skipif(
    not HAVE_RSCRIPT, reason="Rscript not installed in this environment "
    "(doc/how_stats.md: zero-egress image, no R)")


def _windows(chrom="chr1", start=158341239, width=200, count=6):
    return [(chrom, start + i * width, start + (i + 1) * width)
            for i in range(count)]


def _run_r(script, args, tmp_path):
    proc = subprocess.run(
        ["Rscript", os.path.join(REF_SCRIPTS, script), *args],
        capture_output=True, text=True, cwd=tmp_path, timeout=300)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)


@needs_r
def test_plot_pi_trend_reads_our_table(tmp_path):
    table = tmp_path / "eur.pi"
    with open(table, "w") as fh:
        fh.write(pi_table_header(with_subset=True) + "\n")
        for i, (c, s, e) in enumerate(_windows()):
            out = format_pica_output(0.0012, 3.1e-6 * (i + 1), e - s)
            fh.write(pi_row(f"CHM13#0#{c}:{s}-{e}", "EUR", e - s,
                            0.999, 5, out) + "\n")
    png = tmp_path / "pi.png"
    _run_r("plot_pi_trend.R",
           ["--input", f"EUR={table}", "--output", str(png)], tmp_path)
    assert png.exists() and png.stat().st_size > 0


@needs_r
def test_plot_fst_trend_reads_our_table(tmp_path):
    table = tmp_path / "eur.afr.fst"
    with open(table, "w") as fh:
        fh.write(HFST_HEADER + "\n")
        for i, (c, s, e) in enumerate(_windows()):
            fh.write(hfst_row(f"CHM13#0#{c}:{s}-{e}", e - s,
                              0.19 + 0.01 * i, 2.8e-6, 5.8e-6, 4.3e-6,
                              5.3e-6, 1.0e-6) + "\n")
    png = tmp_path / "fst.png"
    _run_r("plot_fst_trend.R",
           ["--input", f"EURvAFR={table}", "--output", str(png)], tmp_path)
    assert png.exists() and png.stat().st_size > 0


@needs_r
def test_plot_tajd_trend_reads_our_table(tmp_path):
    table = tmp_path / "eur.tj"
    with open(table, "w") as fh:
        fh.write(TAJD_HEADER + "\n")
        for i, (c, s, e) in enumerate(_windows()):
            d = float("nan") if i == 3 else -1.99 + 0.2 * i
            fh.write(tajd_row(f"CHM13#0#{c}:{s}-{e}", e - s, 446, 20,
                              5.9e-6, d) + "\n")
    png = tmp_path / "tajd.png"
    _run_r("plot_tajd_trend.R",
           ["--input", f"EUR={table}", "--output", str(png)], tmp_path)
    assert png.exists() and png.stat().st_size > 0
