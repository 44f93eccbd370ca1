"""Differential tests against the reference's own executables.

Runs the actual reference scripts (pica2.py, hudson/hud.py, tj_d.py, af.py)
on randomized similarity fixtures and asserts our CLI reproduces their
stdout.  Skipped when the reference checkout is not mounted (these are
environment-dependent parity checks, not unit tests — the unit-level
semantics live in tests/oracle.py).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/scripts"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def _write_fixture(tmp_path, rng, n=14, n_pops=2):
    """Random clustered similarity TSV + panel lists, reference formats."""
    cls = rng.integers(0, 4, size=n)
    base = 0.994 + 0.005 * (cls[:, None] == cls[None, :])
    noise = rng.normal(0, 0.0008, size=(n, n))
    sim = np.clip(base + (noise + noise.T) / 2, 0.0, 1.0)
    names = [f"seq{i:02d}_pop{'AB'[i % n_pops]}" for i in range(n)]
    lines = ["group.a\tgroup.b\testimated.identity"]
    for i in range(n):
        for j in range(i + 1, n):
            lines.append(f"{names[i]}\t{names[j]}\t{sim[i, j]:.6f}")
    tsv = tmp_path / "sim.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    pa = tmp_path / "pop_A.txt"
    pb = tmp_path / "pop_B.txt"
    pa.write_text("\n".join(nm for nm in names if nm.endswith("popA")) + "\n")
    pb.write_text("\n".join(nm for nm in names if nm.endswith("popB")) + "\n")
    return tsv, pa, pb


def _ref(script, *args, cwd, hashseed=None):
    env = None
    if hashseed is not None:
        env = dict(os.environ, PYTHONHASHSEED=str(hashseed))
    proc = subprocess.run(
        [sys.executable, os.path.join(REF, script), *args],
        capture_output=True, text=True, cwd=cwd, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout.strip()


def _ref_outcomes(script, *args, cwd):
    """All outputs the reference can produce for this input.

    The reference's greedy grouping pops seeds from a Python set
    (pica2.py:100, hud.py order-equivalent) whose string-hash iteration
    order varies with PYTHONHASHSEED — the SAME input yields several
    distinct statistics.  Our engine fixes the documented deterministic
    sorted-row order; parity means landing inside the reference's own
    outcome set."""
    return {
        _ref(script, *args, cwd=cwd, hashseed=hs) for hs in range(8)
    }


def _ours(argv):
    from impop_tpu.cli import main

    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    return buf.getvalue().strip()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pica2_stdout_parity(tmp_path, rng, seed):
    rng = np.random.default_rng(seed)
    tsv, _, _ = _write_fixture(tmp_path, rng)
    want = _ref_outcomes("pica2.py", str(tsv), "-t", "0.999", "-r", "5",
                         "-l", "10000", "-d", str(tmp_path),
                         cwd=str(tmp_path))

    (tmp_path / "one.bed").write_text("chr1\t0\t10000\n")
    simdir = tmp_path / "simdir"
    simdir.mkdir()
    (simdir / "chr1:0-10000.sim").write_text(tsv.read_text())
    out = _ours(["pi", "-b", str(tmp_path / "one.bed"), "--sim-dir",
                 str(simdir), "-P", "", "-t", "0.999", "-r", "5",
                 "-l", "10000"])
    got = out.splitlines()[-1].split("\t")[-1]
    assert got in want, (got, want)


@pytest.mark.parametrize("seed,method", [(4, "direct"), (5, "grouped"),
                                         (6, "grouped")])
def test_hud_stdout_parity(tmp_path, rng, seed, method):
    rng = np.random.default_rng(seed)
    tsv, pa, pb = _write_fixture(tmp_path, rng)
    args = [str(tsv), "-a", str(pa), "-b", str(pb), "-m", method,
            "-d", str(tmp_path)]
    if method == "grouped":
        args += ["-t", "0.999"]
    wants = {w.splitlines()[-1]
             for w in _ref_outcomes("hudson/hud.py", *args, cwd=str(tmp_path))}

    (tmp_path / "one.bed").write_text("chr1\t0\t1000000\n")
    simdir = tmp_path / "simdir"
    simdir.mkdir()
    (simdir / "chr1:0-1000000.sim").write_text(tsv.read_text())
    argv = ["hud", "-b", str(tmp_path / "one.bed"), "--sim-dir", str(simdir),
            "-P", "", "-A", str(pa), "-B", str(pb), "--exact-names",
            "-m", method]
    if method == "grouped":
        argv += ["-t", "0.999"]
    got = _ours(argv).splitlines()[-1].split("\t")
    # our table: REGION LENGTH FST PI_A PI_B PI_XY DXY DA (per-site);
    # hud.py stdout: FST PI_A PI_B PI_XY DXY DA (raw, length 1e6 -> /1e6)
    got_f = [float(got[2])] + [float(x) for x in got[3:8]]

    def close_to(want_line):
        want_f = [float(x) for x in want_line.split("\t")]
        want_scaled = [want_f[0]] + [x / 1e6 for x in want_f[1:6]]
        return (abs(got_f[0] - want_scaled[0]) < 2e-3
                and all(abs(g - w) < 5e-8
                        for g, w in zip(got_f[1:], want_scaled[1:])))

    assert any(close_to(w) for w in wants), (got_f, wants)


def test_af_stdout_parity(tmp_path, rng):
    rng = np.random.default_rng(9)
    tsv, _, _ = _write_fixture(tmp_path, rng)
    want = _ref("af.py", "--input", str(tsv), "--threshold", "0.999",
                cwd=str(tmp_path))
    got = _ours(["afs", "--input", str(tsv), "--threshold", "0.999"])
    assert got == want


def test_tjd_stdout_parity(tmp_path):
    want = _ref("tj_d.py", "-n", "446", "-p", "0.59146123", "-S", "20",
                cwd=str(tmp_path))
    from impop_tpu.stats.api import tajimas_d_jit

    got = float(tajimas_d_jit(446.0, 20.0, 0.59146123))
    # reference prints the D value on the last line
    want_val = float(want.split()[-1])
    np.testing.assert_allclose(got, want_val, rtol=1e-5)
