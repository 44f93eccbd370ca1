"""Hudson Fst (direct / grouped / 3-π) vs the reference-semantics oracle."""
import numpy as np
import pytest

import oracle
from helpers import mask_of, random_sim_case, tile_of

from impop_tpu.stats.api import (
    direct_diversity_jit,
    fst_3pi_jit,
    hudson_fst_direct_jit,
    hudson_fst_grouped_jit,
    pi_grouped_jit,
)

CAP = 128


def _split(names, rng):
    k = len(names) // 2
    perm = rng.permutation(len(names))
    pop_a = sorted(names[i] for i in perm[:k])
    pop_b = sorted(names[i] for i in perm[k:])
    return pop_a, pop_b


@pytest.mark.parametrize("n,missing,rd", [(8, 0.0, None), (30, 0.2, 5),
                                          (64, 0.1, 4), (100, 0.35, 5)])
def test_direct_diversity_matches_oracle(rng, n, missing, rd):
    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing, round_digits=rd)
    pop_a, pop_b = _split(sm.names, rng)
    tile = tile_of(sm, capacity=CAP)
    ma = mask_of(sm, pop_a, capacity=CAP)
    mb = mask_of(sm, pop_b, capacity=CAP)

    got = direct_diversity_jit(tile.sim, tile.present, ma)
    want, count, missing_n = oracle.direct_diversity(sim_dict, pop_a)
    np.testing.assert_allclose(float(got.mean), want, rtol=2e-5, atol=1e-9)
    assert int(got.count) == count
    assert int(got.missing) == missing_n

    got = direct_diversity_jit(tile.sim, tile.present, ma, mb)
    want, count, missing_n = oracle.direct_diversity(sim_dict, pop_a, pop_b)
    np.testing.assert_allclose(float(got.mean), want, rtol=2e-5, atol=1e-9)
    assert int(got.count) == count
    assert int(got.missing) == missing_n


@pytest.mark.parametrize("n,missing,rd", [(10, 0.0, 5), (42, 0.25, 4),
                                          (90, 0.1, 5)])
def test_hudson_fst_direct_matches_oracle(rng, n, missing, rd):
    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing, round_digits=rd)
    pop_a, pop_b = _split(sm.names, rng)
    tile = tile_of(sm, capacity=CAP)
    ma = mask_of(sm, pop_a, capacity=CAP)
    mb = mask_of(sm, pop_b, capacity=CAP)
    got = hudson_fst_direct_jit(tile.sim, tile.present, ma, mb)
    want = oracle.hudson_fst_direct(sim_dict, pop_a, pop_b)
    for field in ("pi_a", "pi_b", "pi_xy", "dxy"):
        np.testing.assert_allclose(
            float(getattr(got, field)), want[field], rtol=5e-5, atol=1e-9,
            err_msg=field,
        )
    for field in ("fst", "da"):
        np.testing.assert_allclose(
            float(getattr(got, field)), want[field], rtol=2e-3, atol=1e-7,
            err_msg=field,
        )


@pytest.mark.parametrize("n,missing,t", [(12, 0.0, 0.995), (36, 0.3, 0.999),
                                         (80, 0.15, 0.995)])
def test_hudson_fst_grouped_matches_oracle(rng, n, missing, t):
    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing, round_digits=5)
    pop_a, pop_b = _split(sm.names, rng)
    tile = tile_of(sm, capacity=CAP)
    ma = mask_of(sm, pop_a, capacity=CAP)
    mb = mask_of(sm, pop_b, capacity=CAP)
    got = hudson_fst_grouped_jit(tile.sim, tile.present, ma, mb, t)
    want = oracle.hudson_fst_grouped(sim_dict, pop_a, pop_b, t)
    for field in ("pi_a", "pi_b", "pi_xy", "dxy"):
        np.testing.assert_allclose(
            float(getattr(got, field)), want[field], rtol=5e-5, atol=1e-9,
            err_msg=field,
        )
    # fst and da subtract near-equal quantities (dxy - pi_xy): the f32
    # cancellation inflates relative error, so they get a wider budget
    for field in ("fst", "da"):
        np.testing.assert_allclose(
            float(getattr(got, field)), want[field], rtol=2e-3, atol=1e-7,
            err_msg=field,
        )


@pytest.mark.parametrize("n,missing,t", [(24, 0.1, 0.999), (60, 0.25, 0.995)])
def test_hudson_fst_grouped_pairs_shares_grouping(rng, n, missing, t):
    """hudson_fst_grouped_pairs (one shared grouping for all Q pairs) ==
    per-pair hudson_fst_grouped == the reference-semantics oracle."""
    import jax
    import jax.numpy as jnp

    from impop_tpu.stats.fst import hudson_fst_grouped_pairs

    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing,
                                   round_digits=5)
    tile = tile_of(sm, capacity=CAP)
    # three overlapping splits -> 3 pairs with distinct stripped masks
    pops = []
    for seed in (1, 2, 3):
        r2 = np.random.default_rng(seed)
        pa, pb = _split(sm.names, r2)
        pops.append((pa, pb))
    masks_a = np.stack([np.asarray(mask_of(sm, pa, capacity=CAP))
                        for pa, _ in pops])
    masks_b = np.stack([np.asarray(mask_of(sm, pb, capacity=CAP))
                        for _, pb in pops])
    got = jax.jit(hudson_fst_grouped_pairs)(
        tile.sim, tile.present, jnp.asarray(masks_a), jnp.asarray(masks_b),
        jnp.float32(t),
    )
    for q, (pa, pb) in enumerate(pops):
        want = oracle.hudson_fst_grouped(sim_dict, pa, pb, t)
        for field in ("pi_a", "pi_b", "pi_xy", "dxy"):
            np.testing.assert_allclose(
                float(getattr(got, field)[q]), want[field], rtol=5e-5,
                atol=1e-9, err_msg=f"{field} pair {q}",
            )
        for field in ("fst", "da"):
            np.testing.assert_allclose(
                float(getattr(got, field)[q]), want[field], rtol=2e-3,
                atol=1e-7, err_msg=f"{field} pair {q}",
            )


def test_fst_3pi_worked_example():
    """doc/how_fst.md:59-65 — πEUR=0.00000279, πAFR=0.00000577,
    πunion=0.00000528 -> Fst = 0.1893939."""
    got = fst_3pi_jit(0.00000279, 0.00000577, 0.00000528)
    np.testing.assert_allclose(float(got), 0.1893939, rtol=1e-5)


def test_fst_3pi_zero_pic_is_nan():
    assert np.isnan(float(fst_3pi_jit(0.0, 0.0, 0.0)))


def test_fst_3pi_consistency_with_pi(rng):
    """3-π Fst assembled from our π kernel matches oracle end-to-end."""
    sim_dict, sm = random_sim_case(rng, 40, missing_frac=0.1, round_digits=5)
    pop_a, pop_b = _split(sm.names, rng)
    union = sorted(set(pop_a) | set(pop_b))
    tile = tile_of(sm, capacity=CAP)
    t = 0.995

    def pi_of(panel):
        mask = mask_of(sm, panel, capacity=CAP)
        return float(pi_grouped_jit(tile.sim, tile.present, np.asarray(mask), t).pi)

    pi_a, pi_b, pi_c = pi_of(pop_a), pi_of(pop_b), pi_of(union)
    got = float(fst_3pi_jit(pi_a, pi_b, pi_c))

    def opi(panel):
        sub = {k: v for k, v in sim_dict.items()
               if k[0] in set(panel) and k[1] in set(panel)}
        return oracle.pica2_pi(sub, panel, t)[0]

    oa, ob, oc = opi(pop_a), opi(pop_b), opi(union)
    want = (oc - 0.5 * (oa + ob)) / oc if oc != 0 else float("nan")
    if np.isnan(want):
        assert np.isnan(got)
    else:
        # (piC - piAB)/piC cancellation: wider f32 budget (see grouped test)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-6)
