"""Batched, mesh-sharded window statistics.

The reference processes windows strictly sequentially, forking four processes
per window (SURVEY.md §3).  Here a *batch* of windows is a stack of padded
tiles and every estimator is vmapped over the leading window axis, jitted
once, and sharded over the mesh ``data`` axis — computation follows the data
placement, so the same compiled function runs on 1 chip or a pod slice.

Panels batch too: all P panels (and all panel *pairs* for Fst — the
reference's 10-pair batch loops, run_h_fst_panels.sh:60-71) are computed from
one shared per-window tile in a single device program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from impop_tpu.parallel.mesh import window_sharding
from impop_tpu.stats.allele import AlleleWindowStats, allele_window_stats, identity_from_alleles, segregating_sites
from impop_tpu.stats.diversity import direct_diversity
from impop_tpu.stats.fst import FstResult, hudson_fst_direct, hudson_fst_direct_pairs, hudson_fst_grouped_pairs
from impop_tpu.stats.pi import PiResult, grouped_diversity, pi_grouped, pi_grouped_panels
from impop_tpu.stats.tajima import tajimas_d

__all__ = [
    "WindowBatch",
    "shard_batch",
    "batch_pi_panels",
    "batch_hudson",
    "batch_fst_3pi_panels",
    "batch_allele_stats",
    "batch_tajd_from_alleles",
]


class WindowBatch(NamedTuple):
    """A stack of W padded similarity tiles plus panel masks.

    sim:     [W, N, N] f32
    present: [W, N, N] bool
    member:  [W, N] bool
    panels:  [W, P, N] bool — per-window panel membership masks
    """

    sim: jnp.ndarray
    present: jnp.ndarray
    member: jnp.ndarray
    panels: jnp.ndarray


def shard_batch(batch: WindowBatch, mesh) -> WindowBatch:
    """Place a WindowBatch on the mesh, window axis sharded over ``data``."""
    return WindowBatch(
        *(
            jax.device_put(a, window_sharding(mesh, np.ndim(a)))
            for a in batch
        )
    )


# ---------------------------------------------------------------- pi over panels


@jax.jit
def batch_pi_panels(
    sim, present, member, panels, threshold
) -> PiResult:
    """pica2-semantics π for every (window, panel): PiResult of [W, P] arrays.

    panels[w, p] is ANDed with member[w]; a panel mask of all-False yields
    π = 0 with n = 0 (the caller maps that to the reference's skip/NA row).
    """

    t = jnp.asarray(threshold, dtype=jnp.float32)
    return jax.vmap(pi_grouped_panels, in_axes=(0, 0, 0, 0, None))(
        sim, present, member, panels, t
    )


# ---------------------------------------------------------------- hudson fst


class HudsonBatchResult(NamedTuple):
    direct: FstResult     # fields [W, Q] for Q panel pairs
    grouped: FstResult    # fields [W, Q]


@partial(jax.jit, static_argnames=("with_grouped",))
def batch_hudson(
    sim, present, member, panels, pair_a, pair_b, threshold,
    with_grouped: bool = True,
) -> HudsonBatchResult:
    """Hudson Fst for every (window, panel-pair).

    pair_a/pair_b: [Q] int32 panel indices defining the Q comparisons
    (e.g. the reference's 10 continental pairs, run_h_fst_panels.sh:60-71).
    Overlapping members are stripped from both sides, matching
    h-fst.py:181-185.  The grouped method shares one grouping pass across
    all Q pairs (hudson_fst_grouped_pairs).
    """
    t = jnp.asarray(threshold, dtype=jnp.float32)

    def one_window(sim1, present1, member1, panels1):
        mask_a = panels1[pair_a] & member1[None, :]
        mask_b = panels1[pair_b] & member1[None, :]
        overlap = mask_a & mask_b
        mask_a = mask_a & ~overlap
        mask_b = mask_b & ~overlap
        direct = hudson_fst_direct_pairs(sim1, present1, mask_a, mask_b)
        if with_grouped:
            grouped = hudson_fst_grouped_pairs(sim1, present1, mask_a,
                                               mask_b, t)
        else:
            grouped = direct
        return HudsonBatchResult(direct, grouped)

    return jax.vmap(one_window)(sim, present, member, panels)


# ---------------------------------------------------------------- 3-pi fst


class Fst3PiBatchResult(NamedTuple):
    pi_a: jnp.ndarray   # [W, Q]
    pi_b: jnp.ndarray
    pi_c: jnp.ndarray
    pi_ab: jnp.ndarray
    fst: jnp.ndarray


@jax.jit
def batch_fst_3pi_panels(
    sim, present, member, panels, pair_a, pair_b, threshold
) -> Fst3PiBatchResult:
    """The run_fst_impg.sh estimator for every (window, panel pair):
    πA, πB, πC over A∪B (all pica2 semantics) and Fst = (πC-πAB)/πC.

    Values are the raw π statistics; the CLI layer performs the reference's
    quantise-through-text per-site formatting (run_fst_impg.sh:199-218).
    """
    t = jnp.asarray(threshold, dtype=jnp.float32)

    def one_window(sim1, present1, member1, panels1):
        # each panel's π is computed ONCE and shared across every pair it
        # appears in (the reference recomputes it per pair — 3 impg+pica2
        # invocations per window per pair, run_fst_impg.sh:184-197); the
        # panel set and the Q pair-union masks go through the shared-matrix
        # panels kernel in one batch
        unions = panels1[pair_a] | panels1[pair_b]
        all_masks = jnp.concatenate([panels1, unions], axis=0)
        pis = pi_grouped_panels(sim1, present1, member1, all_masks, t).pi
        p_count = panels1.shape[0]
        pi_panel = pis[:p_count]
        pi_c = pis[p_count:]
        pi_a = pi_panel[pair_a]
        pi_b = pi_panel[pair_b]
        pi_ab = 0.5 * (pi_a + pi_b)
        fst = jnp.where(
            pi_c != 0, (pi_c - pi_ab) / jnp.where(pi_c != 0, pi_c, 1.0), jnp.nan
        )
        return Fst3PiBatchResult(pi_a, pi_b, pi_c, pi_ab, fst)

    return jax.vmap(one_window)(sim, present, member, panels)


# ---------------------------------------------------------------- allele path


@partial(jax.jit, static_argnames=("max_n", "num_alleles"))
def batch_allele_stats(
    geno, member, site_mask, max_n: int, num_alleles: int = 2
) -> AlleleWindowStats:
    """Fused per-window π/S/AFS straight from [W, N, S] allele tiles."""
    return jax.vmap(
        lambda g, m, s: allele_window_stats(g, m, s, max_n, num_alleles)
    )(geno, member, site_mask)


class TajdBatchResult(NamedTuple):
    pi: jnp.ndarray         # [W, P] pica2-grouped π (per-site, matching the
                            # reference's PI column, run_tajd.sh:174)
    s: jnp.ndarray          # [W] segregating sites (panel-independent,
                            # matching run_tajd.sh whole-window S)
    n: jnp.ndarray          # [W, P] panel sizes
    d: jnp.ndarray          # [W, P] Tajima's D


@partial(jax.jit, static_argnames=("num_alleles",))
def batch_tajd_from_alleles(
    geno, member, site_mask, panels, lengths, threshold,
    num_alleles: int = 2,
) -> TajdBatchResult:
    """The full run_tajd.sh pipeline, fused on device, for every
    (window, panel): one allele-tile extraction feeds BOTH the S branch and
    the π branch (the reference runs two separate native-tool passes per
    window, SURVEY.md §3.4).

    Reference parity quirk, preserved deliberately: tj_d receives pica2's
    *per-site* π (the first stdout token when -l is passed,
    run_tajd.sh:174-180) together with the absolute S count.
    """
    t = jnp.asarray(threshold, dtype=jnp.float32)

    def one_window(g, m, smask, panels1, length):
        sim, present = identity_from_alleles(g, m, smask, length, num_alleles)
        s_count = segregating_sites(g, m, smask)

        def one_panel(pmask):
            res = pi_grouped(sim, present, m & pmask, t)
            pi_site = res.pi / jnp.maximum(length, 1.0)
            d = tajimas_d(res.n, s_count.astype(jnp.float32), pi_site)
            return pi_site, res.n, d

        pi_site, n, d = jax.vmap(one_panel)(panels1)
        return pi_site, s_count, n, d

    pi, s, n, d = jax.vmap(one_window)(
        geno, member, site_mask, panels, jnp.asarray(lengths, jnp.float32)
    )
    return TajdBatchResult(pi, s, n, d)
