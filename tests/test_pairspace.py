"""Cross-chip pair-space sharding: the row-block shard_map path equals the
replicated single-device formulation (SURVEY §2.3 row 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impop_tpu.parallel.mesh import make_mesh
from impop_tpu.parallel.pairspace import pair_sharded_direct_stats


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_pair_sharded_matches_replicated(rng, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    from impop_tpu.stats.allele import identity_from_alleles, segregating_sites
    from impop_tpu.stats.fst import hudson_fst_direct_pairs

    n, s, q = 64, 96, 3
    geno = rng.integers(0, 2, size=(n, s)).astype(np.int8)
    geno[rng.random((n, s)) < 0.1] = -1
    member = np.ones(n, bool); member[-5:] = False
    site_mask = np.ones(s, bool); site_mask[-7:] = False
    masks_a = np.zeros((q, n), bool)
    masks_b = np.zeros((q, n), bool)
    for qi in range(q):
        perm = rng.permutation(n)
        masks_a[qi, perm[:20]] = True
        masks_b[qi, perm[20:45]] = True
    masks_a &= member[None, :]
    masks_b &= member[None, :]
    length = 5000.0

    mesh = make_mesh(data=n_dev)
    fn = pair_sharded_direct_stats(mesh, axis="data")
    pi_a, pi_b, dxy, fst, s_count = jax.tree_util.tree_map(
        np.asarray,
        fn(jnp.asarray(geno), jnp.asarray(member), jnp.asarray(site_mask),
           jnp.asarray(masks_a), jnp.asarray(masks_b), length),
    )

    sim, present = jax.jit(identity_from_alleles)(
        geno, member, site_mask, jnp.float32(length))
    want = hudson_fst_direct_pairs(sim, present, jnp.asarray(masks_a),
                                   jnp.asarray(masks_b))
    np.testing.assert_allclose(pi_a, np.asarray(want.pi_a), rtol=2e-5,
                               atol=1e-9)
    np.testing.assert_allclose(pi_b, np.asarray(want.pi_b), rtol=2e-5,
                               atol=1e-9)
    np.testing.assert_allclose(dxy, np.asarray(want.dxy), rtol=2e-5,
                               atol=1e-9)
    np.testing.assert_allclose(fst, np.asarray(want.fst), rtol=2e-3,
                               atol=1e-6)
    want_s = int(jax.jit(segregating_sites)(geno, member, site_mask))
    assert int(s_count) == want_s
