"""Pallas TPU kernel: fused identity + greedy grouping + S for one window.

The headline scan spends more time crossing HBM between its small stages
than computing (doc/architecture.md "Headline roofline"): identity writes
sim/present, the seed peel re-reads them, the elink build re-reads sim and
writes a link matrix, the gid argmin re-reads that.  This kernel runs the
whole front half of the per-window program in ONE Mosaic program with the
[N, N] working set resident in VMEM:

  1. z-Gram identity: zz = z·zᵀ, vv = |z|·|z|ᵀ, diff = (vv − zz)/2 —
     exact (±1/0 bf16 operands, integer counts in f32 accumulation);
     sim/present finalised in-register (stats/allele.py semantics).
  2. link structure: elink[j, i] = sim > t ∧ present ∧ j < i, built once
     in-register from the resident sim (never touches HBM).
  3. greedy seed peel per 256-column chunk across all R masks
     (ops/seedpeel.py recurrence, statically unrolled over chunks).
  4. per-chunk gid argmin via the exponent-field trick
     (stats/grouping._gid_from_seeds): a batched MXU dot on bit-weighted
     seed rows; floor(log2) read exactly from the f32 exponent field
     (integer sums < 2¹⁶; power-of-two weights are bf16-exact, so the
     MXU's default single-pass product is exact here).
  5. S = polymorphic-column count (∃ valid alt ∧ ∃ valid ref per column —
     biallelic codes, which is what the scan wire carries).

Semantics are bit-identical to composing identity_from_alleles (unit
weights, biallelic) + greedy_group_panels + segregating_sites — asserted
by tests/test_ops.py against the XLA formulations.

Reference capabilities subsumed per window: `impg similarity`'s identity
product (run_pica2_impg.sh:162-168), pica2's greedy grouping
(pica2.py:98-110, deterministic sorted seed order), and the
`povu gfa2vcf | wc -l` S count (run_tajd.sh:148).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["identity_group_pallas"]

_KB = 16  # gid bit-trick block width (sums < 2^16 stay exact integers)


def _make_kernel(n_cap: int, block: int, r_count: int, stages: int = 3):
    """stages: 1 = identity+S only, 2 = +seed peel, 3 = +gid (full) —
    compile-bisection aid for Mosaic regressions; production uses 3."""
    n_chunks = n_cap // block
    nb = n_cap // _KB  # noqa: F841 — kept for the gid block math below

    def kernel(z_ref, m_ref, pm_ref, thr_ref, len_ref,
               sim_ref, pres_ref, gid_ref, s_ref, seeds_acc):
        dims = (((1,), (1,)), ((), ()))
        z = z_ref[:]
        v = jnp.abs(z)
        zz = jax.lax.dot_general(z, z, dims,
                                 preferred_element_type=jnp.float32)
        vv = jax.lax.dot_general(v, v, dims,
                                 preferred_element_type=jnp.float32)
        m = m_ref[0, :]
        length = len_ref[0, 0]
        diff = (vv - zz) * 0.5
        present = (vv > 0) & (m[:, None] > 0) & (m[None, :] > 0)
        sim = jnp.where(present, 1.0 - diff / jnp.maximum(length, 1.0), 0.0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cap, n_cap), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cap, n_cap), 1)
        diag = (row_ids == col_ids) & (m[:, None] > 0)
        sim = jnp.where(diag, 1.0, sim)
        sim_ref[:] = sim
        pres_ref[:] = (present | diag).astype(jnp.int8)

        # S: biallelic polymorphic columns (z codes: +1 alt / -1 ref / 0
        # invalid — already member- and site-masked by the caller's
        # prep).  keepdims (Mosaic mishandles rank-1 intermediates) and
        # f32 widening before the compares (bf16 cmpf doesn't lower on
        # this backend — r4 bisect)
        any_alt = (jnp.max(z, axis=0, keepdims=True)
                   .astype(jnp.float32) > 0.5)              # [1, S]
        any_ref = (jnp.min(z, axis=0, keepdims=True)
                   .astype(jnp.float32) < -0.5)
        s_ref[0, 0] = jnp.sum((any_alt & any_ref).astype(jnp.float32))

        # strict > threshold link, j earlier than i (grouping.py:78-81)
        thr = thr_ref[0, 0]
        linkf = jnp.where(
            (sim > thr) & present & (row_ids < col_ids), 1.0, 0.0)

        # exact powers of two via the f32 exponent field (jnp.exp2 is
        # approximate — grouping.py:276-279): weight(k) = 2^(KB-1-k)
        kvec = jax.lax.broadcasted_iota(jnp.int32, (1, _KB), 1)
        weights = jax.lax.bitcast_convert_type(
            (127 + _KB - 1 - kvec) << 23, jnp.float32)      # [1, KB]

        seeds_acc[:] = jnp.zeros_like(seeds_acc)
        if stages < 2:
            gid_ref[:] = jnp.zeros((r_count, n_cap), jnp.int32)
            return
        for c in range(n_chunks):
            lo = c * block
            elink_c = linkf[:, lo:lo + block]               # [N, K]
            pm_c = pm_ref[:, lo:lo + block]                 # [R, K]
            absorbed_ext = jax.lax.dot_general(
                seeds_acc[:], elink_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) > 0.5                                         # [R, K]
            in_chunk = linkf[lo:lo + block, lo:lo + block]  # [K, K]
            absorbed_ext_f = jnp.where(absorbed_ext, 1.0, 0.0)

            def peel_round(state, in_chunk=in_chunk, pm_c=pm_c,
                           absorbed_ext_f=absorbed_ext_f):
                decided_f, seed_cf = state
                undecided = pm_c * (1.0 - decided_f)
                hits = jax.lax.dot_general(
                    jnp.concatenate([undecided, seed_cf], axis=0),
                    in_chunk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                blocked = hits[:r_count] > 0.5
                absorbed = jnp.maximum(
                    absorbed_ext_f,
                    jnp.where(hits[r_count:] > 0.5, 1.0, 0.0))
                frontier = undecided * jnp.where(blocked, 0.0, 1.0)
                new_seed = frontier * (1.0 - absorbed)
                return (
                    jnp.maximum(decided_f,
                                jnp.maximum(frontier, undecided * absorbed)),
                    jnp.maximum(seed_cf, new_seed),
                )

            def peel_cond(state, pm_c=pm_c):
                decided_f, _ = state
                return jnp.max(pm_c * (1.0 - decided_f)) > 0.5

            def peel_body(state):
                return peel_round(peel_round(state))

            _, seed_c = jax.lax.while_loop(
                peel_cond, peel_body, (1.0 - pm_c, jnp.zeros_like(pm_c)))
            seeds_acc[:, lo:lo + block] = seed_c
            if stages < 3:
                gid_ref[:, lo:lo + block] = jnp.zeros(
                    (r_count, block), jnp.int32)
                continue

            # fused gid for this chunk's columns: per 16-row block, one
            # tiny MXU dot of bit-weighted seed rows against the
            # resident elink slice, exact exponent readback, incremental
            # min.  Statically unrolled over the nb blocks — Mosaic
            # rejects the batched-dot formulation (batch dims must share
            # a position) and its compiler CHECK-crashes on the 3-D
            # transpose that would fix it (r4 log), so plain 2-D dots it
            # is; they are trivially small ([R,16]@[16,K]).
            sa = seeds_acc[:]                               # [R, N]
            min_cand = jnp.full((r_count, block), n_cap, jnp.int32)
            # rows j >= chunk end cannot be earlier neighbours (elink is
            # strictly upper-triangular) — skip their blocks
            for b in range((lo + block) // _KB):
                wseed_b = sa[:, b * _KB:(b + 1) * _KB] * weights
                eb_b = elink_c[b * _KB:(b + 1) * _KB, :]    # [KB, K]
                s_b = jax.lax.dot_general(
                    wseed_b, eb_b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # [R, K]
                expo = (jax.lax.bitcast_convert_type(s_b, jnp.int32)
                        >> 23) - 127
                cand_b = jnp.where(
                    s_b > 0, b * _KB + (_KB - 1 - expo), n_cap)
                min_cand = jnp.minimum(min_cand, cand_b)
            col_c = (jax.lax.broadcasted_iota(
                jnp.int32, (r_count, block), 1) + lo)
            gid_c = jnp.where(seed_c > 0.5, col_c, min_cand)
            gid_ref[:, lo:lo + block] = jnp.where(
                pm_c > 0.5, gid_c, n_cap)

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "stages"))
def identity_group_pallas(geno, member, site_mask, pmasks, threshold,
                          length, block: int = 256, stages: int = 3):
    """Fused identity + grouping + S for one biallelic window.

    Args:
      geno:      [N, S] int8 0/1 alleles, -1 missing (N % block == 0,
                 block % 128 == 0; S % 128 == 0)
      member:    [N] bool
      site_mask: [S] bool
      pmasks:    [R, N] bool mask stack (panels + unions + stripped sides)
      threshold: scalar f32 (strict > link rule)
      length:    scalar f32 window length in bp
    Returns:
      (sim [N, N] f32, present [N, N] bool, gid [R, N] int32,
       s_count f32 scalar)
    """
    n_cap, s_cap = geno.shape
    r_count = pmasks.shape[0]
    assert n_cap % block == 0 and block % 128 == 0 and n_cap % _KB == 0

    g2 = jnp.where(site_mask[None, :] & member[:, None], geno, jnp.int8(-1))
    v = (g2 >= 0).astype(jnp.bfloat16)
    a = jnp.maximum(g2, 0).astype(jnp.bfloat16)
    z = a + a - v  # +1 alt / -1 ref / 0 invalid
    member_f = member.astype(jnp.float32)[None, :]
    pm_f = (pmasks & member[None, :]).astype(jnp.float32)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)
    len_v = jnp.asarray(length, jnp.float32).reshape(1, 1)

    sim, pres, gid, s_out = pl.pallas_call(
        _make_kernel(n_cap, block, r_count, stages),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_cap, s_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_count, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_cap, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cap, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_count, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cap, n_cap), jnp.float32),
            jax.ShapeDtypeStruct((n_cap, n_cap), jnp.int8),
            jax.ShapeDtypeStruct((r_count, n_cap), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((r_count, n_cap), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_cap * n_cap * s_cap + 4 * r_count * n_cap * n_cap,
            bytes_accessed=2 * n_cap * s_cap + 6 * n_cap * n_cap,
            transcendentals=0,
        ),
    )(z, member_f, pm_f, thr, len_v)
    return sim, pres.astype(bool), gid, s_out[0, 0]
