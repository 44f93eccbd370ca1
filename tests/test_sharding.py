"""Shard-count invariance: identical statistics on 1-device and 8-device
meshes (SURVEY.md §4d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_sim_case

from impop_tpu.parallel.longwindow import site_sharded_window_stats
from impop_tpu.parallel.mesh import make_mesh, window_sharding
from impop_tpu.parallel.scan import (
    batch_fst_3pi_panels,
    batch_hudson,
    batch_pi_panels,
    shard_batch,
)
from impop_tpu.runtime.batcher import PanelSet, build_window_batch

CAP = 64
W = 8


def _make_batch(rng, w=W, n=24):
    mats = [random_sim_case(rng, n, missing_frac=0.1, round_digits=5)[1]
            for _ in range(w)]
    names = mats[0].names
    panels = PanelSet.from_dict({
        "EVEN": tuple(names[::2]),
        "ODD": tuple(names[1::2]),
    })
    batch, _ = build_window_batch(mats, panels, capacity=CAP, batch_pad=8,
                                  exact_names=True)
    return batch


def _tree_np(x):
    return jax.tree_util.tree_map(np.asarray, x)


def test_pi_shard_invariance(rng):
    batch = _make_batch(rng)
    mesh1 = make_mesh(data=1)
    mesh8 = make_mesh(data=8)

    r1 = _tree_np(batch_pi_panels(*shard_batch(batch, mesh1), 0.995))
    r8 = _tree_np(batch_pi_panels(*shard_batch(batch, mesh8), 0.995))
    np.testing.assert_allclose(r1.pi, r8.pi, rtol=1e-6)
    np.testing.assert_array_equal(r1.num_groups, r8.num_groups)


def test_hudson_shard_invariance(rng):
    batch = _make_batch(rng)
    pair_a = jnp.asarray([0], dtype=jnp.int32)
    pair_b = jnp.asarray([1], dtype=jnp.int32)
    mesh1 = make_mesh(data=1)
    mesh8 = make_mesh(data=8)
    r1 = _tree_np(batch_hudson(*shard_batch(batch, mesh1), pair_a, pair_b, 0.995))
    r8 = _tree_np(batch_hudson(*shard_batch(batch, mesh8), pair_a, pair_b, 0.995))
    np.testing.assert_allclose(r1.direct.fst, r8.direct.fst, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(r1.grouped.dxy, r8.grouped.dxy, rtol=1e-5, atol=1e-9)


def test_fst3pi_shard_invariance(rng):
    batch = _make_batch(rng)
    pair_a = jnp.asarray([0], dtype=jnp.int32)
    pair_b = jnp.asarray([1], dtype=jnp.int32)
    mesh8 = make_mesh(data=8)
    r1 = _tree_np(batch_fst_3pi_panels(batch.sim, batch.present, batch.member,
                                       batch.panels, pair_a, pair_b, 0.995))
    r8 = _tree_np(batch_fst_3pi_panels(*shard_batch(batch, mesh8),
                                       pair_a, pair_b, 0.995))
    np.testing.assert_allclose(r1.fst, r8.fst, rtol=1e-5, atol=1e-7, equal_nan=True)


def test_site_sharded_long_window(rng):
    """Site-axis psum path == single-device computation."""
    w, n, s = 8, 16, 64
    geno = rng.integers(0, 2, size=(w, n, s)).astype(np.int8)
    member = np.ones((w, n), dtype=bool)
    site_mask = np.ones((w, s), dtype=bool)
    lengths = np.full(w, 1000.0, dtype=np.float32)

    mesh21 = make_mesh(data=1, site=1)
    mesh24 = make_mesh(data=2, site=4)

    f1 = site_sharded_window_stats(mesh21, max_n=n)
    f8 = site_sharded_window_stats(mesh24, max_n=n)
    with mesh21:
        pi1, s1, d1 = jax.tree_util.tree_map(
            np.asarray, f1(geno, member, site_mask, lengths, 0.999)
        )
    with mesh24:
        pi8, s8, d8 = jax.tree_util.tree_map(
            np.asarray, f8(geno, member, site_mask, lengths, 0.999)
        )
    np.testing.assert_allclose(pi1, pi8, rtol=1e-5)
    np.testing.assert_array_equal(s1, s8)
    np.testing.assert_allclose(d1, d8, rtol=1e-4, equal_nan=True)


def test_batcher_roundtrip(rng):
    """Batched π equals the single-window jit path for every window/panel."""
    from impop_tpu.stats.api import pi_grouped_jit

    batch = _make_batch(rng, w=3)
    res = batch_pi_panels(batch.sim, batch.present, batch.member,
                          batch.panels, 0.995)
    for wi in range(3):
        for pi_idx in range(2):
            single = pi_grouped_jit(
                batch.sim[wi], batch.present[wi],
                batch.member[wi] & batch.panels[wi, pi_idx], 0.995,
            )
            np.testing.assert_allclose(
                float(res.pi[wi, pi_idx]), float(single.pi), rtol=1e-6
            )
    # padding windows (3..7) produce zero-n results
    assert float(res.n[3:].max()) == 0.0
