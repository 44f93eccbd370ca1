"""Extended Haplotype Homozygosity (EHH).

The reference prototypes (wip/ehh2.py:72-86, wip/ehhgfa.py:6-21) compute
EHH(i) = (# haplotype pairs identical on sites 0..i) / C(n, 2) with a triple
Python loop re-comparing whole prefixes at every site — O(S²·n²).

TPU formulation: one lax.scan over the site axis carrying the [N, N] boolean
"still identical" pair matrix; per step an elementwise AND with the current
site's equality matrix and a masked pair-count reduction — O(S·n²) fused
vector work, no prefix recomparison.  The decay to both sides of a focal SNP
and the area under the curve (wip/ehhgfa.py:47-69) build on the same scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "ehh_forward",
    "ehh_bidirectional",
    "ehh_decay_from_focal",
    "ehh_area_batch",
    "EhhResult",
]


def _pair_mask(member: jnp.ndarray) -> jnp.ndarray:
    n_cap = member.shape[0]
    upper = jnp.triu(jnp.ones((n_cap, n_cap), dtype=bool), k=1)
    return upper & member[:, None] & member[None, :]


def ehh_forward(
    geno: jnp.ndarray, member: jnp.ndarray, site_mask: jnp.ndarray
) -> jnp.ndarray:
    """EHH over growing prefixes [0..i] for each site i.

    Matches wip/ehh2.py:72-86: pairs must agree on *every* site of the
    prefix; the result at site i is the agreeing-pair fraction.  Sites with
    site_mask False are ignored (treated as agreeing).  Returns [S] f32.
    """
    pairs = _pair_mask(member)
    n = jnp.sum(member.astype(jnp.float32))
    denom = jnp.maximum(n * (n - 1.0) * 0.5, 1.0)

    def step(alive, inputs):
        col, active = inputs
        eq = col[:, None] == col[None, :]
        alive = alive & (eq | ~active)
        frac = jnp.sum((alive & pairs).astype(jnp.float32)) / denom
        return alive, frac

    alive0 = jnp.ones_like(pairs)
    _, fracs = jax.lax.scan(step, alive0, (geno.T, site_mask))
    return fracs


def ehh_bidirectional(
    geno: jnp.ndarray, member: jnp.ndarray, site_mask: jnp.ndarray
) -> jnp.ndarray:
    """[reversed EHH of the flipped matrix, forward EHH] — the concatenation
    the reference prints (wip/ehh2.py:93-95).  Returns [2S] f32."""
    fwd = ehh_forward(geno, member, site_mask)
    rev = ehh_forward(geno[:, ::-1], member, site_mask[::-1])
    return jnp.concatenate([rev[::-1], fwd])


class EhhResult(NamedTuple):
    ehh: jnp.ndarray   # [2*(S-1)] decay curve (left reversed ++ right)
    area: jnp.ndarray  # scalar — cumulative sum of the curve (ehhgfa.py:64)
    carriers: jnp.ndarray  # scalar — number of haplotypes carrying the allele


def ehh_decay_from_focal(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    focal: int,
    allele: jnp.ndarray,
) -> EhhResult:
    """EHH decay away from a focal site for carriers of ``allele``.

    Reproduces wip/ehhgfa.py:47-69: restrict to haplotypes whose call at
    ``focal`` equals ``allele``, split the window at the focal site
    (exclusive), compute EHH right-ward on the suffix and left-ward on the
    reversed prefix, concatenate, and integrate via cumulative sum.

    ``focal`` is a static python int (site index in the window).
    """
    carriers = member & (geno[:, focal] == allele)
    s_total = geno.shape[1]
    left = geno[:, :focal][:, ::-1]
    left_mask = site_mask[:focal][::-1]
    right = geno[:, focal + 1:]
    right_mask = site_mask[focal + 1:]

    left_ehh = (
        ehh_forward(left, carriers, left_mask)
        if focal > 0
        else jnp.zeros((0,), dtype=jnp.float32)
    )
    right_ehh = (
        ehh_forward(right, carriers, right_mask)
        if focal + 1 < s_total
        else jnp.zeros((0,), dtype=jnp.float32)
    )
    curve = jnp.concatenate([left_ehh[::-1], right_ehh])
    area = jnp.sum(curve)
    return EhhResult(curve, area, jnp.sum(carriers.astype(jnp.int32)))


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("focal", "compat_right_for_left"))
def ehh_area_batch(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    focal: int,
    alleles: jnp.ndarray,
    compat_right_for_left: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EHH decay areas for every (window, focal allele) in ONE program.

    The windowed-scan driver of wip/ehhgfa.py:47-69, batched: carriers are
    selected with a boolean MASK (never a row slice), so every window and
    allele shares a single compiled shape — the per-(carriers, suffix)
    recompilation of a naive port is structurally impossible here.

    Args:
      geno:      [W, N, S] int8 binarised haplotype windows (pad cols with
                 anything and mask them off)
      member:    [W, N] bool (pad rows False)
      site_mask: [W, S] bool
      focal:     static focal site index within each window
      alleles:   [A] allele codes to evaluate at the focal site
      compat_right_for_left: reproduce the reference's use of the right
                 suffix for BOTH decay directions (ehhgfa.py:58-62)
    Returns:
      (area [W, A] f32, carriers [W, A] int32)
    """

    def one_window(g, m, sm):
        def per_allele(al):
            carriers = m & (g[:, focal] == al)
            right_ehh = ehh_forward(g[:, focal + 1:], carriers,
                                    sm[focal + 1:])
            if compat_right_for_left:
                # the reference feeds the REVERSED right suffix to the left
                # branch (ehhgfa.py:58-62: `left = right` before the flip)
                left_ehh = ehh_forward(g[:, focal + 1:][:, ::-1], carriers,
                                       sm[focal + 1:][::-1])
            elif focal > 0:
                left_ehh = ehh_forward(g[:, :focal][:, ::-1], carriers,
                                       sm[:focal][::-1])
            else:
                left_ehh = jnp.zeros((0,), jnp.float32)
            # area = cumsum(curve)[-1] = Σ left + Σ right (ehhgfa.py:64-65)
            area = jnp.sum(left_ehh) + jnp.sum(right_ehh)
            return area, jnp.sum(carriers.astype(jnp.int32))

        return jax.vmap(per_allele)(alleles)

    return jax.vmap(one_window)(geno, member, site_mask)
