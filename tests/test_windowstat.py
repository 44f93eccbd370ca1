"""ops/windowstat.py (the single-kernel whole-window program) must match
composing identity_from_alleles + fused_panel_stats — the scan's round-5
TPU fast path relies on it.  Runs the kernel in Mosaic interpret mode so
the differential executes on the CPU suite."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from impop_tpu.stats.allele import identity_from_alleles, segregating_sites
from impop_tpu.stats.panelstats import (_assemble_from_kernel,
                                        fused_panel_stats)


@pytest.fixture
def rng():
    return np.random.default_rng(29)


def _window(rng, n=256, s=128, frac_missing=0.05):
    cls = rng.integers(0, 6, size=n)
    base = rng.integers(0, 2, size=(6, s)).astype(np.int8)
    geno = base[cls]
    geno = np.where(rng.random((n, s)) < 0.01, 1 - geno, geno).astype(np.int8)
    geno[rng.random((n, s)) < frac_missing] = -1
    geno[-13:] = -1
    member = np.ones(n, bool)
    member[-13:] = False
    smask = np.ones(s, bool)
    smask[-9:] = False
    return geno, member, smask


@pytest.mark.parametrize("disjoint", [True, False])
def test_window_stats_kernel_matches_composition(rng, disjoint):
    from impop_tpu.ops.windowstat import window_stats_pallas

    n, s, p = 256, 128, 4
    geno, member, smask = _window(rng)
    if disjoint:
        pmasks = np.zeros((p, n), bool)
        edges = np.linspace(0, n - 13, p + 1).astype(int)
        for i in range(p):
            pmasks[i, edges[i]:edges[i + 1]] = True
    else:
        pmasks = rng.random((p, n)) < 0.5
    pair_a = tuple(int(a) for a in (0, 0, 1, 2))
    pair_b = tuple(int(b) for b in (1, 2, 3, 3))
    q = len(pair_a)
    t, L = 0.9995, 5000.0

    from impop_tpu.stats.panelstats import panel_mask_stack

    gj = jnp.asarray(geno)
    mj = jnp.asarray(member)
    smj = jnp.asarray(smask)
    pj = jnp.asarray(pmasks)
    all_masks, mask_a, mask_b = panel_mask_stack(
        pj, mj, jnp.asarray(pair_a), jnp.asarray(pair_b), disjoint)

    with pltpu.force_tpu_interpret_mode():
        out = window_stats_pallas(
            gj, mj, smj, all_masks, mask_a, mask_b, jnp.float32(t),
            jnp.float32(L), pair_a, pair_b, disjoint, block=128)
    got = _assemble_from_kernel(out, p + q, q, pair_a, pair_b, disjoint)

    sim, present = identity_from_alleles(gj, mj, smj, jnp.float32(L))
    want = fused_panel_stats(sim, present, mj, pj, jnp.asarray(pair_a),
                             jnp.asarray(pair_b), jnp.float32(t),
                             pairs_disjoint=disjoint)
    s_want = segregating_sites(gj, mj, smj)

    assert int(out["s"]) == int(s_want)
    np.testing.assert_allclose(np.asarray(got.pi), np.asarray(want.pi),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(got.n), np.asarray(want.n))
    np.testing.assert_array_equal(np.asarray(got.num_groups),
                                  np.asarray(want.num_groups))
    np.testing.assert_array_equal(np.asarray(got.pairs_used),
                                  np.asarray(want.pairs_used))
    np.testing.assert_array_equal(np.asarray(got.pairs_missing),
                                  np.asarray(want.pairs_missing))
    for f in ("fst", "pi_a", "pi_b", "pi_xy", "dxy", "da"):
        np.testing.assert_allclose(
            np.asarray(getattr(got.hudson, f)),
            np.asarray(getattr(want.hudson, f)),
            rtol=1e-6, atol=1e-9, err_msg=f"hudson.{f}")
        np.testing.assert_allclose(
            np.asarray(getattr(got.hudson_grouped, f)),
            np.asarray(getattr(want.hudson_grouped, f)),
            rtol=1e-6, atol=1e-9, err_msg=f"hudson_grouped.{f}")
    assert bool(got.seed_risk) == bool(want.seed_risk)


def test_window_stats_kernel_partial_coverage_risk(rng):
    """Disjoint-coverage haplotype pairs must trip seed_risk in the kernel
    exactly as in the XLA path."""
    from impop_tpu.ops.windowstat import window_stats_pallas
    from impop_tpu.stats.panelstats import panel_mask_stack

    n, s = 128, 128
    geno, member, smask = _window(rng, n=n, s=s)
    # two coverage islands with no overlap -> some seed pairs lack data
    geno[: n // 2, s // 2:] = -1
    geno[n // 2:, : s // 2] = -1
    pmasks = np.zeros((2, n), bool)
    pmasks[0, : n // 2] = True
    pmasks[1, n // 2:] = True
    pair_a, pair_b = (0,), (1,)
    t, L = 0.9995, 5000.0

    gj = jnp.asarray(geno)
    mj = jnp.asarray(member)
    smj = jnp.asarray(smask)
    pj = jnp.asarray(pmasks)
    all_masks, mask_a, mask_b = panel_mask_stack(
        pj, mj, jnp.asarray(pair_a), jnp.asarray(pair_b), True)
    with pltpu.force_tpu_interpret_mode():
        out = window_stats_pallas(
            gj, mj, smj, all_masks, mask_a, mask_b, jnp.float32(t),
            jnp.float32(L), pair_a, pair_b, True, block=128)
    got = _assemble_from_kernel(out, 3, 1, pair_a, pair_b, True)

    sim, present = identity_from_alleles(gj, mj, smj, jnp.float32(L))
    want = fused_panel_stats(sim, present, mj, pj, jnp.asarray(pair_a),
                             jnp.asarray(pair_b), jnp.float32(t),
                             pairs_disjoint=True)
    assert bool(want.seed_risk), "fixture must actually trip the flag"
    assert bool(got.seed_risk)


def test_fused_window_stats_no_matrices_cpu_fallback(rng):
    """return_matrices=False on CPU keeps the composed path (gate is
    TPU-only) and still returns matrices=None is NOT promised there —
    the call must simply work and agree with return_matrices=True."""
    from impop_tpu.stats.panelstats import fused_window_stats

    geno, member, smask = _window(rng)
    pmasks = np.stack([member & (np.arange(256) % 2 == 0),
                       member & (np.arange(256) % 2 == 1)])
    a = fused_window_stats(jnp.asarray(geno), jnp.asarray(member),
                           jnp.asarray(smask), jnp.float32(5000.0),
                           jnp.asarray(pmasks), jnp.asarray((0,)),
                           jnp.asarray((1,)), jnp.float32(0.9995),
                           pairs_disjoint=True, return_matrices=False)
    b = fused_window_stats(jnp.asarray(geno), jnp.asarray(member),
                           jnp.asarray(smask), jnp.float32(5000.0),
                           jnp.asarray(pmasks), jnp.asarray((0,)),
                           jnp.asarray((1,)), jnp.float32(0.9995),
                           pairs_disjoint=True, return_matrices=True)
    np.testing.assert_allclose(np.asarray(a[3].pi), np.asarray(b[3].pi),
                               rtol=1e-6)
    assert float(a[2]) == float(b[2])
