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


# ---------------------------------------------------------------------------
# Alignment-based oracle (no impg needed): a small Needleman-Wunsch aligner
# on the RAW simulated sequences provides true alignment-column identity,
# breaking the circularity of validating our identity formula against a
# re-derivation of itself.  Contract approximated:
# reference run_pica2_impg.sh:162-168 (impg similarity estimated.identity).


def _nw_stats(a: str, b: str):
    """Unit-cost global alignment (mismatch=1, gap=1).

    Returns (matches, columns) along one optimal path (diagonal-preferring
    traceback).  Row DP is vectorised; the in-row left-gap dependence is
    resolved with the minimum.accumulate prefix trick.
    """
    n, m = len(a), len(b)
    av = np.frombuffer(a.encode(), np.uint8)
    bv = np.frombuffer(b.encode(), np.uint8)
    D = np.zeros((n + 1, m + 1), np.int32)
    D[0] = np.arange(m + 1)
    idx = np.arange(m + 1)
    for i in range(1, n + 1):
        sub = D[i - 1, :-1] + (av[i - 1] != bv)
        up = D[i - 1, 1:] + 1
        base = np.empty(m + 1, np.int32)
        base[0] = i
        base[1:] = np.minimum(sub, up)
        D[i] = np.minimum.accumulate(base - idx) + idx
    # traceback
    i, j = n, m
    matches = columns = 0
    while i > 0 or j > 0:
        if (i > 0 and j > 0
                and D[i, j] == D[i - 1, j - 1] + (av[i - 1] != bv[j - 1])):
            matches += int(av[i - 1] == bv[j - 1])
            i -= 1
            j -= 1
        elif i > 0 and D[i, j] == D[i - 1, j] + 1:
            i -= 1
        else:
            j -= 1
        columns += 1
    return matches, columns


def _read_fasta_raw(path):
    seqs, name = {}, None
    with open(path) as fh:
        for line in fh:
            if line.startswith(">"):
                name = line[1:].split()[0]
                seqs[name] = []
            else:
                seqs[name].append(line.strip())
    return {k: "".join(v) for k, v in seqs.items()}


def _oracle_vs_ours(tmp_path, seed, p_indel, n_snps, ref_len=1200, n_haps=6,
                    site_pool=None):
    from impop_tpu.extract.simulate import _revcomp

    sim = simulate(str(tmp_path), ref_len=ref_len, n_haps=n_haps,
                   n_snps=n_snps, p_indel=p_indel, seed=seed,
                   span=(0, ref_len), site_pool=site_pool)
    region = f"CHM13#0#chr1:0-{ref_len}"
    ours = _identity_matrix(tmp_path, sim, region, "columns")
    raw = _read_fasta_raw(sim.fasta_path)
    # window-oriented sequence per matrix row (ref row = reference itself)
    seq_of = {f"{sim.ref_name}:0-{ref_len}": sim.ref_seq}
    for h in sim.haplotypes:
        contig = raw[h.name.split(":", 1)[0]] if h.name in raw else raw[h.name]
        seq_of_name = _revcomp(contig) if h.reverse else contig
        seq_of[h.name] = seq_of_name
    rows = []
    for nm in ours.names:
        stem = nm.rsplit(":", 1)[0]
        rows.append(seq_of[stem] if stem in seq_of else seq_of[nm])
    return sim, ours, rows


def test_identity_matches_alignment_oracle_snp_only(tmp_path):
    """SNP-only, shared-allele sites: columns-mode identity must EQUAL the
    alignment oracle's matches/columns (no gaps -> columns == L)."""
    sim, ours, rows = _oracle_vs_ours(tmp_path, seed=21, p_indel=0.0,
                                      n_snps=0, site_pool=40)
    L = 1200.0
    n = len(rows)
    checked = 0
    for i in range(n):
        for j in range(i + 1, n):
            if not ours.present[i, j]:
                continue
            matches, columns = _nw_stats(rows[i], rows[j])
            assert columns == len(rows[i]) == len(rows[j])
            oracle = matches / columns
            np.testing.assert_allclose(ours.sim[i, j], oracle, atol=1e-9)
            checked += 1
    assert checked >= 10


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_identity_within_documented_bound_of_alignment_oracle(tmp_path, seed):
    """With planted indels: |ours - matches/columns| per pair is bounded by
    the documented deviation budget (total indel columns in either
    haplotype / L, doc/how_stats.md 'Identity definition and impg parity').
    The expected values derive from alignment of raw sequences, NOT from
    the engine's own diff formula."""
    sim, ours, rows = _oracle_vs_ours(tmp_path, seed=seed, p_indel=0.5,
                                      n_snps=14, ref_len=1500)
    L = 1500.0
    # per-haplotype ground-truth indel column budget (simulation truth,
    # independent of the extractor)
    budget = {f"{sim.ref_name}:0-1500": 0.0}
    for h in sim.haplotypes:
        cols = sum(len(s) for s in h.insertions.values())
        cols += sum(h.deletions.values())
        budget[h.name] = float(cols)
    names = [nm.rsplit(":", 1)[0] if nm.rsplit(":", 1)[0] in budget else nm
             for nm in ours.names]
    n = len(rows)
    checked = indels_seen = 0
    for i in range(n):
        for j in range(i + 1, n):
            if not ours.present[i, j]:
                continue
            matches, columns = _nw_stats(rows[i], rows[j])
            oracle = matches / columns
            bound = (budget[names[i]] + budget[names[j]] + 2.0) / L
            assert abs(ours.sim[i, j] - oracle) <= bound, (
                names[i], names[j], ours.sim[i, j], oracle, bound)
            indels_seen += budget[names[i]] + budget[names[j]] > 0
            checked += 1
    assert checked >= 10 and indels_seen >= 5
