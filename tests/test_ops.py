"""Pallas kernel vs XLA formulation (interpret mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from impop_tpu.ops.pairdiff import pairwise_identity_pallas, pairwise_identity_xla


def test_pairwise_identity_pallas_matches_xla(rng):
    n, s = 256, 512
    geno = rng.integers(0, 2, size=(n, s)).astype(np.int8)
    geno[rng.random((n, s)) < 0.07] = -1
    geno[-20:] = -1
    member = np.ones(n, bool)
    member[-20:] = False
    site_mask = np.ones(s, bool)
    site_mask[-13:] = False
    length = jnp.float32(5000.0)

    with pltpu.force_tpu_interpret_mode():
        sim_p, pres_p = pairwise_identity_pallas(
            geno, member, site_mask, length, tile_n=128, tile_s=256
        )
    sim_x, pres_x = jax.jit(pairwise_identity_xla)(
        geno, member, site_mask, length
    )
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_x),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pres_p), np.asarray(pres_x))


def test_pairwise_identity_weighted_pallas_matches_xla(rng):
    """Column-mode (weighted) identity: Pallas kernel == weighted XLA path,
    and unit weights == the unweighted path."""
    from impop_tpu.stats.allele import identity_from_alleles

    n, s = 128, 256
    geno = rng.integers(0, 2, size=(n, s)).astype(np.int8)
    geno[rng.random((n, s)) < 0.05] = -1
    member = np.ones(n, bool)
    site_mask = np.ones(s, bool)
    length = jnp.float32(4000.0)
    weights = rng.integers(1, 6, size=s).astype(np.float32)

    sim_w, pres_w = jax.jit(
        lambda g, m, sm, L, w: identity_from_alleles(g, m, sm, L,
                                                     site_weights=w)
    )(geno, member, site_mask, length, weights)
    with pltpu.force_tpu_interpret_mode():
        sim_p, pres_p = pairwise_identity_pallas(
            geno, member, site_mask, length, tile_n=128, tile_s=128,
            site_weights=jnp.asarray(weights),
        )
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_w),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pres_p), np.asarray(pres_w))

    # unit weights reproduce the unweighted path exactly
    sim_1, _ = jax.jit(
        lambda g, m, sm, L, w: identity_from_alleles(g, m, sm, L,
                                                     site_weights=w)
    )(geno, member, site_mask, length, np.ones(s, np.float32))
    sim_0, _ = jax.jit(identity_from_alleles)(geno, member, site_mask, length)
    np.testing.assert_array_equal(np.asarray(sim_1), np.asarray(sim_0))


def test_seed_peel_pallas_matches_greedy_group(rng):
    from impop_tpu.ops.seedpeel import seed_peel_pallas
    from impop_tpu.stats.grouping import greedy_group

    n, p = 256, 4
    cls = rng.integers(0, 7, size=n)
    base = 0.99 + 0.01 * (cls[:, None] == cls[None, :])
    noise = rng.normal(0, 0.004, size=(n, n))
    sim = np.clip(base + (noise + noise.T) / 2, 0, 1).astype(np.float32)
    np.fill_diagonal(sim, 1.0)
    present = rng.random((n, n)) < 0.9
    present = present & present.T
    np.fill_diagonal(present, True)
    member = rng.random(n) < 0.9
    pmasks = rng.random((p, n)) < 0.7

    # block=256 is the TPU default (half the sequential chunk rounds);
    # pin block-size invariance by checking both widths
    for blk in (128, 256):
        with pltpu.force_tpu_interpret_mode():
            seed = np.asarray(seed_peel_pallas(
                jnp.asarray(sim), jnp.asarray(present), jnp.asarray(member),
                jnp.asarray(pmasks), 0.995, block=blk))
        for pi in range(p):
            gid = np.asarray(greedy_group(
                jnp.asarray(sim), jnp.asarray(present),
                jnp.asarray(member & pmasks[pi]), 0.995))
            expect = (gid == np.arange(n)) & member & pmasks[pi]
            np.testing.assert_array_equal(seed[pi], expect)


def test_identity_group_fused_matches_composition(rng):
    """ops/idgroup.py (one Mosaic program: z-Gram identity + seed peel +
    gid + S) must be bit-identical to composing identity_from_alleles +
    greedy_group_panels + segregating_sites — the scan's TPU fast path
    (stats.panelstats.fused_window_stats) relies on it."""
    from impop_tpu.ops.idgroup import identity_group_pallas
    from impop_tpu.stats.allele import (identity_from_alleles,
                                        segregating_sites)
    from impop_tpu.stats.grouping import greedy_group_panels

    n, s, r = 256, 128, 7
    cls = rng.integers(0, 6, size=n)
    base = rng.integers(0, 2, size=(6, s)).astype(np.int8)
    geno = base[cls]
    geno = np.where(rng.random((n, s)) < 0.01, 1 - geno, geno).astype(np.int8)
    geno[rng.random((n, s)) < 0.05] = -1
    geno[-13:] = -1
    member = np.ones(n, bool); member[-13:] = False
    smask = np.ones(s, bool); smask[-9:] = False
    pmasks = rng.random((r, n)) < 0.6
    t, L = 0.9995, 5000.0

    with pltpu.force_tpu_interpret_mode():
        sim_p, pres_p, gid_p, s_p = identity_group_pallas(
            jnp.asarray(geno), jnp.asarray(member), jnp.asarray(smask),
            jnp.asarray(pmasks), jnp.float32(t), jnp.float32(L), block=128)

    sim_x, pres_x = identity_from_alleles(
        jnp.asarray(geno), jnp.asarray(member), jnp.asarray(smask),
        jnp.float32(L))
    gid_x = greedy_group_panels(sim_x, pres_x, jnp.asarray(member),
                                jnp.asarray(pmasks), jnp.float32(t))
    s_x = segregating_sites(jnp.asarray(geno), jnp.asarray(member),
                            jnp.asarray(smask))
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_x),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pres_p), np.asarray(pres_x))
    np.testing.assert_array_equal(np.asarray(gid_p), np.asarray(gid_x))
    assert int(s_p) == int(s_x)
