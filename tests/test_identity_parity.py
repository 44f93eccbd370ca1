"""Native identity vs `impg similarity` — the L1 contract.

The reference's whole extraction layer boils down to `estimated.identity`
values from `impg similarity` (reference run_pica2_impg.sh:162-168, consumed
at pica2.py:22-27).  Our native path computes 1 − diff/L from variant calls
(stats/allele.identity_from_alleles); the deviation spec lives in
doc/how_stats.md "Identity definition and impg parity".  Two layers of test:

1. unit-level checks of the spec itself on planted variants (always run);
2. a differential test against a real `impg` binary (skipped when absent,
   the same pattern as tests/test_reference_parity.py) bounding the
   deviation of our identities from impg's on simulated PAF+FASTA data.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from impop_tpu.extract import site_weights_from_keys
from impop_tpu.extract.pyfallback import PyExtractor
from impop_tpu.extract.simulate import simulate

HAVE_IMPG = shutil.which("impg") is not None


def _identity_matrix(tmp_path, sim, region, mode, round_digits=None):
    from impop_tpu.cli import GenoSimSource

    src = GenoSimSource(round_digits, paf=sim.paf_path, fasta=sim.fasta_path,
                        use_native=False, identity_mode=mode)
    return src.load(region)


def test_event_vs_column_mode_on_planted_indel(tmp_path):
    """A k-base insertion costs 1 difference in events mode, k in columns
    mode; SNP-only pairs are identical in both modes."""
    sim = simulate(str(tmp_path), ref_len=2000, n_haps=6, n_snps=10,
                   p_indel=0.6, seed=77, span=(0, 2000))
    region = "CHM13#0#chr1:0-2000"
    ev = _identity_matrix(tmp_path, sim, region, "events")
    co = _identity_matrix(tmp_path, sim, region, "columns")
    assert ev.names == co.names

    ex = PyExtractor(sim.paf_path, sim.fasta_path)
    wm = ex.extract(sim.ref_name, 0, 2000)
    w = site_weights_from_keys(wm.site_keys)
    assert (w >= 1).all()
    has_indel = (w > 1).any()
    assert has_indel, "fixture must plant at least one multi-base indel"

    # hand-computed expectation per pair from the allele matrix
    g = wm.geno
    order = np.argsort(wm.names)
    g = np.asarray(g)[order]
    L = 2000.0
    n = g.shape[0]
    for i in range(n):
        for j in range(n):
            both = (g[i] >= 0) & (g[j] >= 0)
            neq = both & (g[i] != g[j])
            d_ev = float(neq.sum())
            d_co = float(w[neq.astype(bool)].sum()) if neq.any() else 0.0
            if i == j:
                continue
            if both.any():
                np.testing.assert_allclose(ev.sim[i, j], 1.0 - d_ev / L,
                                           atol=1e-12)
                np.testing.assert_allclose(co.sim[i, j], 1.0 - d_co / L,
                                           atol=1e-12)
    # columns mode is never MORE similar than events mode
    assert (co.sim <= ev.sim + 1e-12).all()


def test_snp_only_modes_agree(tmp_path):
    sim = simulate(str(tmp_path), ref_len=1500, n_haps=5, n_snps=12,
                   p_indel=0.0, seed=5, span=(0, 1500))
    region = "CHM13#0#chr1:0-1500"
    ev = _identity_matrix(tmp_path, sim, region, "events")
    co = _identity_matrix(tmp_path, sim, region, "columns")
    np.testing.assert_array_equal(ev.sim, co.sim)


def test_geno_sim_source_device_path_matches_reference_numpy(tmp_path):
    """The device-computed diff counts reproduce the straight host-side
    formulation exactly (counts are integers, f32-exact)."""
    sim = simulate(str(tmp_path), ref_len=2500, n_haps=8, n_snps=15,
                   p_indel=0.4, seed=13, span=(0, 2500))
    region = "CHM13#0#chr1:0-2500"
    got = _identity_matrix(tmp_path, sim, region, "events", round_digits=5)

    ex = PyExtractor(sim.paf_path, sim.fasta_path)
    wm = ex.extract(sim.ref_name, 0, 2500)
    order = np.argsort(wm.names)
    g = np.asarray(wm.geno, np.int16)[order]
    valid = g >= 0
    gg = np.where(valid, g, 0)
    compared = valid.astype(np.float64) @ valid.T
    match = np.zeros_like(compared)
    for a in range(int(gg.max(initial=0)) + 1):
        xa = ((gg == a) & valid).astype(np.float64)
        match += xa @ xa.T
    from impop_tpu.io.simtsv import round_half_even

    sim_ref = 1.0 - (compared - match) / 2500.0
    present = compared > 0
    np.fill_diagonal(present, True)
    sim_ref = np.where(present, sim_ref, 0.0)
    np.fill_diagonal(sim_ref, 1.0)
    sim_ref = round_half_even(sim_ref, 5)
    np.testing.assert_array_equal(got.sim, sim_ref)
    np.testing.assert_array_equal(got.present, present)


@pytest.mark.skipif(not HAVE_IMPG, reason="impg binary not on PATH")
def test_impg_similarity_differential(tmp_path):
    """Against a real impg: per-pair |identity_ours − identity_impg| is
    bounded by the documented deviation (indel-length excess / L), and the
    downstream pica2 grouping at t=0.999 r=5 agrees."""
    sim = simulate(str(tmp_path), ref_len=5000, n_haps=10, n_snps=20,
                   p_indel=0.3, seed=3, span=(0, 5000))
    region = "CHM13#0#chr1:0-5000"
    proc = subprocess.run(
        ["impg", "similarity", "-p", sim.paf_path, "-r", region,
         "--sequence-files", sim.fasta_path],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    theirs = {}
    for line in proc.stdout.splitlines()[1:]:
        a, b, ident = line.split("\t")[:3]
        theirs[frozenset((a, b))] = float(ident)

    ours = _identity_matrix(tmp_path, sim, region, "columns")
    ex = PyExtractor(sim.paf_path, sim.fasta_path)
    wm = ex.extract(sim.ref_name, 0, 5000)
    w = site_weights_from_keys(wm.site_keys)
    max_indel_cols = float(w.sum())  # loosest possible per-pair excess
    bound = max_indel_cols / 5000.0 + 1e-4
    checked = 0
    for i, a in enumerate(ours.names):
        for j in range(i + 1, len(ours.names)):
            key = frozenset((a, ours.names[j]))
            if key in theirs and ours.present[i, j]:
                assert abs(ours.sim[i, j] - theirs[key]) <= bound, key
                checked += 1
    assert checked > 0
