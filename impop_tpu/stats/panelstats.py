"""Fused per-window panel statistics — the engine's single device pass.

One window's similarity matrix serves every estimator of the fused scan
(cli scan / bench.py): pica2-grouped π for each panel AND each pair-union
(the 3-π Fst numerators, run_fst_impg.sh:184-205), Hudson direct Fst for
each panel pair (h-fst.py semantics), and the group-pair bookkeeping π
logging needs.  All masked reductions collapse into two stacked matmuls
computed by ops/panelquad.py (operands built in-register on TPU), after a
single shared grouping pass (ops/seedpeel.py).

Semantics are identical to composing stats.pi.pi_grouped_panels +
stats.fst.hudson_fst_direct_pairs — asserted by tests/test_panelstats.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from impop_tpu.stats.fst import FstResult, _assemble
from impop_tpu.stats.grouping import greedy_group_panels, group_sizes

__all__ = ["PanelStats", "fused_panel_stats"]


class PanelStats(NamedTuple):
    pi: jnp.ndarray             # [P+Q] raw π per panel then per pair-union
    n: jnp.ndarray              # [P+Q] member counts
    num_groups: jnp.ndarray     # [P+Q]
    pairs_used: jnp.ndarray     # [P+Q]
    pairs_missing: jnp.ndarray  # [P+Q]
    hudson: FstResult           # [Q]-shaped direct-method fields


def _use_pallas(n_cap: int) -> bool:
    return jax.default_backend() not in ("cpu",) and n_cap % 128 == 0


def fused_panel_stats(
    sim: jnp.ndarray,
    present: jnp.ndarray,
    member: jnp.ndarray,
    pmasks: jnp.ndarray,
    pair_a: jnp.ndarray,
    pair_b: jnp.ndarray,
    threshold,
) -> PanelStats:
    """All panel/pair statistics of one window in one fused pass.

    Args:
      sim:     [N, N] f32 similarities
      present: [N, N] bool
      member:  [N] bool
      pmasks:  [P, N] bool panel masks
      pair_a/pair_b: [Q] int32 panel indices of the pair batch
      threshold: grouping threshold scalar
    """
    n_cap = member.shape[0]
    p_count = pmasks.shape[0]
    q_count = pair_a.shape[0]

    unions = pmasks[pair_a] | pmasks[pair_b]
    all_masks = jnp.concatenate([pmasks, unions], axis=0)      # [P+Q, N]
    pq = p_count + q_count

    gid = greedy_group_panels(sim, present, member, all_masks, threshold)
    pm = all_masks & member[None, :]
    n = jnp.sum(pm.astype(jnp.float32), axis=1)                # [P+Q]
    sizes = jax.vmap(group_sizes)(gid, pm)                     # [P+Q, N]
    is_rep = sizes > 0
    w = jnp.where(
        is_rep, sizes.astype(jnp.float32) / jnp.maximum(n, 1.0)[:, None], 0.0
    )
    rep_f = is_rep.astype(jnp.float32)

    # Hudson pair masks, overlap-stripped (h-fst.py:181-185)
    mask_a = pmasks[pair_a] & member[None, :]
    mask_b = pmasks[pair_b] & member[None, :]
    ov = mask_a & mask_b
    a_f = (mask_a & ~ov).astype(jnp.float32)
    b_f = (mask_b & ~ov).astype(jnp.float32)

    wd = jnp.concatenate([w, a_f, b_f], axis=0)                # [P+3Q, N]
    wp = jnp.concatenate([rep_f, a_f, b_f], axis=0)

    if _use_pallas(n_cap):
        from impop_tpu.ops.panelquad import masked_pair_sums_pallas

        yd, yp = masked_pair_sums_pallas(sim, present, wd, wp)
    else:
        from impop_tpu.ops.panelquad import masked_pair_sums_xla

        yd, yp = masked_pair_sums_xla(sim, present, wd, wp)

    def rowdot(x, y):
        return jnp.sum(x * y, axis=1)

    # π quadratic forms + group-pair presence (pi_grouped_panels semantics)
    quad = rowdot(yd[:pq], w)
    pairs_used = jnp.round(rowdot(yp[:pq], rep_f) / 2.0).astype(jnp.int32)
    num_groups = jnp.sum(is_rep.astype(jnp.int32), axis=1)
    pairs_total = (num_groups * (num_groups - 1)) // 2
    pi = jnp.where(
        (n > 1) & (pairs_used > 0), n / jnp.maximum(n - 1.0, 1.0) * quad, 0.0
    )

    # Hudson direct (hudson_fst_direct_pairs semantics)
    yd_a = yd[pq:pq + q_count]
    yd_b = yd[pq + q_count:]
    yp_a = yp[pq:pq + q_count]
    yp_b = yp[pq + q_count:]
    sum_aa, cnt_aa = rowdot(yd_a, a_f) * 0.5, rowdot(yp_a, a_f) * 0.5
    sum_bb, cnt_bb = rowdot(yd_b, b_f) * 0.5, rowdot(yp_b, b_f) * 0.5
    sum_ab, cnt_ab = rowdot(yd_a, b_f), rowdot(yp_a, b_f)
    pi_a = jnp.where(cnt_aa > 0, sum_aa / jnp.maximum(cnt_aa, 1.0), 0.0)
    pi_b = jnp.where(cnt_bb > 0, sum_bb / jnp.maximum(cnt_bb, 1.0), 0.0)
    dxy = jnp.where(cnt_ab > 0, sum_ab / jnp.maximum(cnt_ab, 1.0), 0.0)

    return PanelStats(
        pi, n, num_groups, pairs_used, pairs_total - pairs_used,
        _assemble(pi_a, pi_b, dxy),
    )
