"""π estimator vs the reference-semantics oracle."""
import numpy as np
import pytest

import oracle
from helpers import mask_of, random_sim_case, tile_of

import jax
import jax.numpy as jnp

from impop_tpu.stats.grouping import greedy_group
from impop_tpu.stats.api import grouped_diversity_jit, pi_grouped_jit

greedy_group_jit = jax.jit(
    lambda sim, present, member, t: greedy_group(
        sim, present, member, jnp.asarray(t, jnp.float32)
    )
)


def _oracle_gid(sim_dict, names, threshold, round_digits=None):
    groups = oracle.greedy_groups(sim_dict, names, threshold, round_digits)
    gid = {}
    for g in groups:
        seed = min(g)
        for m in g:
            gid[m] = seed
    return gid


@pytest.mark.parametrize("n,missing,rd", [(6, 0.0, None), (24, 0.2, 4),
                                          (61, 0.35, 5), (97, 0.1, 3)])
def test_greedy_group_matches_oracle(rng, n, missing, rd):
    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing, round_digits=rd)
    tile = tile_of(sm, capacity=128)
    gid = np.asarray(greedy_group_jit(tile.sim, tile.present, tile.member, 0.995))
    expect = _oracle_gid(sim_dict, sm.names, 0.995, None)
    idx = sm.index()
    for name in sm.names:
        assert sm.names[gid[idx[name]]] == expect[name], name


@pytest.mark.parametrize("n,missing,rd,t", [
    (2, 0.0, None, 0.999), (7, 0.0, 5, 0.995), (33, 0.25, 4, 0.995),
    (64, 0.1, 5, 0.999), (120, 0.4, 3, 0.997),
])
def test_pi_grouped_matches_oracle(rng, n, missing, rd, t):
    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing, round_digits=rd)
    tile = tile_of(sm, capacity=128)
    got = pi_grouped_jit(tile.sim, tile.present, tile.member, t)
    want, _ = oracle.pica2_pi(sim_dict, sm.names, t)
    np.testing.assert_allclose(float(got.pi), want, rtol=2e-5, atol=1e-9)
    assert int(got.n) == n


def test_pi_grouped_edge_cases(rng):
    # single element -> 0 (reference returns before the Bessel division)
    sim_dict, sm = random_sim_case(rng, 1)
    tile = tile_of(sm, capacity=128)
    got = pi_grouped_jit(tile.sim, tile.present, tile.member, 0.999)
    assert float(got.pi) == 0.0

    # all identical -> one group -> 0
    sim_dict, sm = random_sim_case(rng, 5, low=1.0, high=1.0)
    tile = tile_of(sm, capacity=128)
    got = pi_grouped_jit(tile.sim, tile.present, tile.member, 0.999)
    assert float(got.pi) == 0.0
    assert int(got.num_groups) == 1

    # two groups but representative pair missing -> 0 (pairs skipped)
    names = ["a#1#", "b#1#", "c#1#"]
    sim_dict = {("a#1#", "b#1#"): 1.0}  # a,b group; c alone; no (a,c) data
    import numpy as np
    from impop_tpu.io.simtsv import SimilarityMatrix
    mat = np.eye(3)
    present = np.eye(3, dtype=bool)
    mat[0, 1] = mat[1, 0] = 1.0
    present[0, 1] = present[1, 0] = True
    sm = SimilarityMatrix(names, mat, present, 1)
    tile = tile_of(sm, capacity=128)
    got = pi_grouped_jit(tile.sim, tile.present, tile.member, 0.999)
    assert float(got.pi) == 0.0
    assert int(got.pairs_missing) == 1


@pytest.mark.parametrize("n,missing,t", [(9, 0.0, 0.995), (40, 0.3, 0.999),
                                         (77, 0.15, 0.995)])
def test_grouped_diversity_matches_hud_oracle(rng, n, missing, t):
    sim_dict, sm = random_sim_case(rng, n, missing_frac=missing, round_digits=5)
    tile = tile_of(sm, capacity=128)
    got = grouped_diversity_jit(tile.sim, tile.present, tile.member, t)
    want, n_groups, n_missing = oracle.hud_grouped_diversity(
        sim_dict, sm.names, t
    )
    np.testing.assert_allclose(float(got.pi), want, rtol=2e-5, atol=1e-9)
    assert int(got.num_groups) == n_groups
    assert int(got.pairs_missing) == n_missing


def test_pi_subset_masks(rng):
    """π over a panel mask equals π over the sub-matrix of that panel."""
    sim_dict, sm = random_sim_case(rng, 30, missing_frac=0.1, round_digits=4)
    panel = sm.names[::3]
    tile = tile_of(sm, capacity=128)
    mask = mask_of(sm, panel, capacity=128)
    got = pi_grouped_jit(tile.sim, tile.present, tile.member & np.asarray(mask), 0.995)
    sub_dict = {k: v for k, v in sim_dict.items()
                if k[0] in set(panel) and k[1] in set(panel)}
    want, _ = oracle.pica2_pi(sub_dict, panel, 0.995)
    np.testing.assert_allclose(float(got.pi), want, rtol=2e-5, atol=1e-9)


def test_pi_grouped_panels_matches_single(rng):
    """Shared-matrix panels kernel == per-panel pi_grouped."""
    from impop_tpu.stats.pi import pi_grouped_panels

    sim_dict, sm = random_sim_case(rng, 60, missing_frac=0.2, round_digits=5)
    tile = tile_of(sm, capacity=128)
    pmasks = np.zeros((4, 128), dtype=bool)
    pmasks[0, :60] = True                      # all
    pmasks[1, :60:2] = True                    # evens
    pmasks[2, 1:60:3] = True                   # sparse
    pmasks[3, :0] = True                       # empty
    f = jax.jit(lambda s, p, m, pm, t: pi_grouped_panels(
        s, p, m, pm, jnp.asarray(t, jnp.float32)))
    res = f(tile.sim, tile.present, tile.member, jnp.asarray(pmasks), 0.995)
    for pi_idx in range(4):
        single = pi_grouped_jit(
            tile.sim, tile.present,
            tile.member & jnp.asarray(pmasks[pi_idx]), 0.995,
        )
        np.testing.assert_allclose(
            float(res.pi[pi_idx]), float(single.pi), rtol=1e-5, atol=1e-9,
            err_msg=str(pi_idx),
        )
        assert int(res.num_groups[pi_idx]) == int(single.num_groups)
        assert int(res.pairs_used[pi_idx]) == int(single.pairs_used)
