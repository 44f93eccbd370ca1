"""Host-streamed site tiles == one-shot computation, chunk-count invariant.

The streaming accumulator (runtime/sitestream.py) is the no-length-cap
long-context path (SURVEY.md §5): every accumulated quantity is a sum over
disjoint site chunks, so any chunking of the site axis must reproduce the
one-shot result exactly.
"""
import numpy as np
import pytest

from impop_tpu.runtime.sitestream import SiteStreamAccumulator
from impop_tpu.stats.allele import (
    allele_frequency_spectrum,
    identity_from_alleles,
    segregating_sites,
)
from impop_tpu.stats.pi import pi_grouped
from impop_tpu.stats.tajima import tajimas_d

import jax.numpy as jnp


def _window(rng, n=24, s=700, missing=0.02):
    geno = (rng.random((n, s)) < 0.3).astype(np.int8)
    geno[rng.random((n, s)) < missing] = -1
    member = np.ones(n, bool)
    member[-2:] = False
    smask = np.ones(s, bool)
    return geno, member, smask


@pytest.mark.parametrize("chunk_s", [128, 256, 999])
def test_streaming_matches_oneshot(chunk_s):
    rng = np.random.default_rng(5)
    geno, member, smask = _window(rng)
    n, s = geno.shape
    length = 5000.0
    thr = 0.999

    sim1, present1 = identity_from_alleles(
        jnp.asarray(geno), jnp.asarray(member), jnp.asarray(smask), length
    )
    s1 = segregating_sites(jnp.asarray(geno), jnp.asarray(member),
                           jnp.asarray(smask))
    res1 = pi_grouped(sim1, present1, jnp.asarray(member), thr)
    d1 = tajimas_d(res1.n, s1.astype(jnp.float32), res1.pi / length)
    afs1 = allele_frequency_spectrum(
        jnp.asarray(geno), jnp.asarray(member), jnp.asarray(smask), n
    )

    acc = SiteStreamAccumulator(member, chunk_s=chunk_s, afs_max_n=n)
    for lo in range(0, s, chunk_s):
        acc.update(geno[:, lo:lo + chunk_s])
    out = acc.finalize(length, thr)

    np.testing.assert_array_equal(np.asarray(out.s), np.asarray(s1))
    # difference COUNTS are exact integers either way (asserted in the
    # weighted test below); sim may differ by 1 ulp because XLA rewrites
    # the /length into a reciprocal multiply in one graph but not the other
    np.testing.assert_allclose(np.asarray(out.sim), np.asarray(sim1),
                               rtol=0, atol=1.2e-7)
    np.testing.assert_array_equal(np.asarray(out.present),
                                  np.asarray(present1))
    np.testing.assert_allclose(np.asarray(out.pi), np.asarray(res1.pi),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.d), np.asarray(d1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.afs), np.asarray(afs1))


def test_streaming_weighted_and_multiallelic():
    rng = np.random.default_rng(11)
    n, s = 16, 400
    geno = rng.integers(0, 3, size=(n, s)).astype(np.int8)
    geno[rng.random((n, s)) < 0.05] = -1
    member = np.ones(n, bool)
    smask = np.ones(s, bool)
    weights = rng.integers(1, 5, size=s).astype(np.float32)

    from impop_tpu.stats.allele import pairwise_diff

    d1, c1 = pairwise_diff(jnp.asarray(geno), jnp.asarray(member),
                           jnp.asarray(smask), 3, jnp.asarray(weights))

    acc = SiteStreamAccumulator(member, chunk_s=128, num_alleles=3,
                                weighted=True)
    for lo in range(0, s, 150):
        acc.update(geno[:, lo:lo + 150], site_weights=weights[lo:lo + 150])
    diff, comp = acc._state[0], acc._state[1]
    np.testing.assert_allclose(np.asarray(diff), np.asarray(d1), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(c1), rtol=0,
                               atol=0)


def test_unweighted_counts_are_integer_accumulated():
    """Unweighted accumulators carry diff/compared in int32 so counts stay
    exact beyond f32's 2^24 ceiling (ADVICE r2: a whole-chromosome site axis
    can exceed 16.7M mutually-valid sites per pair)."""
    member = np.ones(4, bool)
    acc = SiteStreamAccumulator(member, chunk_s=128)
    acc.update(np.ones((4, 100), np.int8))
    assert acc._state[0].dtype == jnp.int32
    assert acc._state[1].dtype == jnp.int32
    with pytest.raises(ValueError):
        acc.update(np.ones((4, 100), np.int8),
                   site_weights=np.ones(100, np.float32))


def test_finalize_pi_member_subset():
    """finalize(pi_member=...) narrows grouped-π/n/D to the subset while S
    keeps counting every row — run_tajd.sh semantics (S from the whole
    window graph :148, subset only feeds pica2 :160)."""
    rng = np.random.default_rng(3)
    geno, member, smask = _window(rng, n=20, s=300)
    length, thr = 5000.0, 0.999
    sub = np.zeros(20, bool)
    sub[:10] = True

    acc = SiteStreamAccumulator(member, chunk_s=128)
    for lo in range(0, 300, 128):
        acc.update(geno[:, lo:lo + 128])
    out = acc.finalize(length, thr, pi_member=sub)

    # S over ALL member rows
    s_full = segregating_sites(jnp.asarray(geno), jnp.asarray(member),
                               jnp.asarray(smask))
    np.testing.assert_array_equal(np.asarray(out.s), np.asarray(s_full))
    # π/n over the subset only
    sim1, present1 = identity_from_alleles(
        jnp.asarray(geno), jnp.asarray(member), jnp.asarray(smask), length
    )
    res_sub = pi_grouped(sim1, present1, jnp.asarray(sub & member), thr)
    assert int(np.asarray(out.n)) == int(np.asarray(res_sub.n)) == 10
    np.testing.assert_allclose(np.asarray(out.pi), np.asarray(res_sub.pi),
                               rtol=1e-6)
    d_exp = tajimas_d(res_sub.n, s_full.astype(jnp.float32),
                      res_sub.pi / length)
    np.testing.assert_allclose(np.asarray(out.d), np.asarray(d_exp),
                               rtol=1e-5)


def test_update_after_finalize_rejected():
    member = np.ones(8, bool)
    acc = SiteStreamAccumulator(member, chunk_s=64)
    acc.update(np.zeros((8, 10), np.int8))
    acc.finalize(100.0, 0.999)
    with pytest.raises(RuntimeError):
        acc.update(np.zeros((8, 10), np.int8))
