"""Pallas TPU kernel: the ENTIRE per-window panel-stat program, one program.

Round-4's ops/idgroup.py fused the front half (identity + seed peel + gid
argmin + S) into one VMEM-resident Mosaic program, but still wrote
sim/present/gid back to HBM for a multi-stage XLA tail (group-size
histogram, weight build, the stacked HIGHEST-precision panel reduction,
Hudson row-dots, seed_risk) — ~3-4 of the ~10 µs/window budget plus ~3 MB
of [N, N] HBM traffic per window (doc/architecture.md "Headline
roofline").  This kernel folds the tail in too.  Per window NOTHING of
shape [N, N] ever crosses HBM: the inputs are the [N, S] z-codes and the
[R, N] mask stacks, the outputs are the per-panel/per-pair statistic
vectors ([R, 1]-shaped columns + SMEM scalars).

The round-4 blocker was Mosaic CHECK-crashing on the lane→sublane
relayout of an in-kernel scatter/reshape histogram.  This implementation
uses the factored one-hot MATMUL histogram instead (the trick
stats/grouping.group_sizes already uses on the XLA path), arranged so no
reshape/transpose exists at all:

  per grouping row r (statically unrolled):
    gb, gk       = gid >> 4, gid & 15                        [1, N] int32
    ohb[b, i]    = (gb[i] == b) ∧ pm[r, i]                   [NB, N]
    ohk[k, i]    = (gk[i] == k)                              [16, N]
    sizes_bk     = ohb · ohkᵀ          (MXU, exact 0/1)      [NB, 16]
    t1           = sizes_bk · ohk      (MXU, HIGHEST: sizes  [NB, N]
                                        up to N overflow a single-pass
                                        bf16 mantissa)
    size_of(i)   = Σ_b ohb[b, i]·t1[b, i]  (VPU col-reduce)  [1, N]
    w[r]         = seed[r] ⊙ size_of / max(n_r, 1)

— every step is a 2-D dot or an elementwise/keepdims reduce; nothing is
reshaped, transposed, gathered or scattered.

Stage 5 then runs panelquad's two stacked reductions against the RESIDENT
sim/present (div/mask built in-register), all the row-dots that
fused_panel_stats used to do in XLA, and the seed_risk reduction (the
column-orientation copy of the seed vector comes from one exact
identity-matrix dot, avoiding a 2-D transpose).

Semantics are identical to stats.panelstats.fused_panel_stats composed
with ops/idgroup.py — asserted in interpret mode and on-chip by
tests/test_windowstat.py.

Reference capabilities subsumed per window: `impg similarity`'s identity
product (run_pica2_impg.sh:162-168), pica2's greedy grouping + π terms
(pica2.py:98-145), h-fst.py's within/cross diversity sums
(h-fst.py:130-171), hud.py's grouped method (hud.py:100-128, 235-263),
and the `povu gfa2vcf | wc -l` S count (run_tajd.sh:148).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_stats_pallas"]

_KB = 16  # gid bit-trick block width (sums < 2^16 stay exact integers)
_HI = jax.lax.Precision.HIGHEST


def _make_kernel(n_cap: int, block: int, r_count: int, pq: int, q: int,
                 pair_a: tuple, pair_b: tuple, disjoint: bool, stages: int,
                 yd_precision=_HI, peel_unroll: int = 2):
    """stages: 1 identity+S · 2 +seed peel · 3 +gid · 4 +group weights ·
    5 full reduction (production) — compile/correctness bisection aid."""
    n_chunks = n_cap // block
    nb = n_cap // _KB

    def kernel(z_ref, m_ref, pm_ref, ma_ref, mb_ref, thr_ref, len_ref,
               o_pi, o_n, o_ng, o_pu,
               o_saa, o_caa, o_sbb, o_cbb, o_sab, o_cab,
               o_gd, s_ref, risk_ref,
               seeds_acc, gid_acc, w_acc):
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
        presf = jnp.where(present | diag, 1.0, 0.0)

        # S (idgroup.py semantics: biallelic z codes, keepdims, f32
        # compares — bf16 cmpf does not lower on this backend)
        any_alt = (jnp.max(z, axis=0, keepdims=True)
                   .astype(jnp.float32) > 0.5)
        any_ref = (jnp.min(z, axis=0, keepdims=True)
                   .astype(jnp.float32) < -0.5)
        s_ref[0, 0] = jnp.sum((any_alt & any_ref).astype(jnp.float32))

        # the fixed row-dot outputs that exist at every stage
        pm = pm_ref[:]
        o_n[:] = jnp.sum(pm, axis=1, keepdims=True)

        thr = thr_ref[0, 0]
        linkf = jnp.where(
            (sim > thr) & present & (row_ids < col_ids), 1.0, 0.0)

        seeds_acc[:] = jnp.zeros_like(seeds_acc)
        gid_acc[:] = jnp.full_like(gid_acc, n_cap)
        w_acc[:] = jnp.zeros_like(w_acc)

        def zero_fill():
            for ref in (o_pi, o_pu, o_saa, o_caa, o_sbb, o_cbb, o_sab,
                        o_cab, o_gd):
                ref[:] = jnp.zeros_like(ref)
            o_ng[:] = jnp.zeros_like(o_ng)
            risk_ref[0, 0] = jnp.float32(0.0)

        if stages < 2:
            zero_fill()
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
                # peel_unroll rounds per while iteration: more rounds =
                # fewer (serialising) cond checks, at the cost of no-op
                # rounds after convergence (A/B'd on-chip)
                for _ in range(peel_unroll):
                    state = peel_round(state)
                return state

            _, seed_c = jax.lax.while_loop(
                peel_cond, peel_body, (1.0 - pm_c, jnp.zeros_like(pm_c)))
            seeds_acc[:, lo:lo + block] = seed_c
            if stages < 3:
                continue

            # fused gid for this chunk's columns: 8 seed-row blocks of 16
            # share ONE dot by giving each block its own 32-BINADE weight
            # slot (the ops/ehhdeath.py decode trick — smaller row index
            # = larger exponent, strictly monotone, junk provably below
            # half an integer step even after f32 rounding), so the
            # argmin reads back from a single exponent per 128-row group
            # instead of one tiny K=16 dot per block (the per-block form
            # was MXU-dispatch-bound; narrow 16-lane slices also cost —
            # the EHH kernel measured them at ~25%).
            sa = seeds_acc[:]
            min_cand = jnp.full((r_count, block), n_cap, jnp.int32)
            n_rows = lo + block
            for grp0 in range(0, n_rows, 8 * _KB):
                gsz = min(8 * _KB, n_rows - grp0)
                nblk = gsz // _KB
                it = jax.lax.broadcasted_iota(jnp.int32, (1, gsz), 1)
                b_loc = jax.lax.shift_right_logical(it, 4)
                k_loc = jnp.bitwise_and(it, _KB - 1)
                w_row = jax.lax.bitcast_convert_type(
                    (1 + 32 * ((nblk - 1) - b_loc)
                     + ((_KB - 1) - k_loc)) << 23, jnp.float32)
                ws = sa[:, grp0:grp0 + gsz] * w_row         # [R, gsz]
                eb = elink_c[grp0:grp0 + gsz, :]            # [gsz, K]
                s_g = jax.lax.dot_general(
                    ws, eb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # [R, K]
                ebx = jax.lax.shift_right_logical(
                    jax.lax.bitcast_convert_type(s_g, jnp.int32), 23) - 1
                s_slot = jax.lax.shift_right_logical(ebx, 5)
                e_low = jnp.bitwise_and(ebx, 31)
                j_loc = (_KB * ((nblk - 1) - s_slot)
                         + ((_KB - 1) - e_low))
                cand = jnp.where(s_g > 0, grp0 + j_loc, n_cap)
                min_cand = jnp.minimum(min_cand, cand)
            col_c = (jax.lax.broadcasted_iota(
                jnp.int32, (r_count, block), 1) + lo)
            gid_c = jnp.where(seed_c > 0.5, col_c, min_cand)
            gid_acc[:, lo:lo + block] = jnp.where(
                pm_c > 0.5, gid_c, n_cap)

        o_ng[:] = jnp.sum(seeds_acc[:], axis=1, keepdims=True)
        if stages < 4:
            zero_fill()
            o_ng[:] = jnp.sum(seeds_acc[:], axis=1, keepdims=True)
            return

        # ---- stage 4: group weights via the factored one-hot matmul
        # histogram (module docstring) — per grouping row, statically
        # unrolled.  A fully-batched variant (one hot stacks for all R
        # rows, block-diagonal-masked dots) was MEASURED SLOWER (5.3 vs
        # 3.5 µs/window: the batched dot computes all R² cross-row blocks
        # — 15× wasted MXU work).  The per-row cost is MXU passes, so the
        # distribute dot splits sizes into two bf16-EXACT pieces
        # (multiples of 256 + remainder < 256 — exact for n_cap ≤ 65536)
        # and runs two single-pass dots instead of one 6-pass HIGHEST
        # dot: 3 MXU passes per row instead of 7.
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (nb, n_cap), 0)
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (_KB, n_cap), 0)
        for r in range(r_count):
            gid_r = gid_acc[r:r + 1, :]                     # [1, N] int32
            pm_r = pm_ref[r:r + 1, :]                       # [1, N]
            gb = jax.lax.shift_right_logical(gid_r, 4)
            gk = jnp.bitwise_and(gid_r, _KB - 1)
            ohb = jnp.where((iota_b == gb) & (pm_r > 0.5), 1.0, 0.0)
            ohk = jnp.where(iota_k == gk, 1.0, 0.0)
            sizes_bk = jax.lax.dot_general(
                ohb, ohk, dims, preferred_element_type=jnp.float32)
            s_hi = jnp.floor(sizes_bk * (1.0 / 256.0)) * 256.0
            s_lo = sizes_bk - s_hi
            t1 = (jax.lax.dot_general(
                      s_hi, ohk, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(
                      s_lo, ohk, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32))
            szrow = jnp.sum(ohb * t1, axis=0, keepdims=True)  # [1, N]
            n_r = jnp.sum(pm_r, axis=1, keepdims=True)        # [1, 1]
            w_acc[r:r + 1, :] = (seeds_acc[r:r + 1, :] * szrow
                                 / jnp.maximum(n_r, 1.0))
        if stages < 5:
            zero_fill()
            o_ng[:] = jnp.sum(seeds_acc[:], axis=1, keepdims=True)
            return

        # ---- stage 5: the fused panel reduction (panelquad semantics)
        # against the RESIDENT sim/present + every row-dot of
        # fused_panel_stats.  The reduction is LINEAR in the weight rows,
        # so the grouped-Hudson rows are never duplicated: the quadratic
        # forms run over ALL R grouping rows at once (o_pi[r] =
        # w_r·D·w_r — π for panels/unions, within-diversity for the
        # stripped sides) and only the CROSS form Dxy needs a gathered
        # row-dot (o_gd[q] = (w_ia·D)·w_ib, reusing yd rows).
        ma = ma_ref[:]                                      # [Q, N]
        mb = mb_ref[:]
        w_all = w_acc[:]
        wd = jnp.concatenate([w_all, ma, mb], axis=0)       # [R+2Q, N]
        wp = jnp.concatenate([seeds_acc[:pq], ma, mb], axis=0)

        maskf = presf * jnp.where(row_ids == col_ids, 0.0, 1.0)
        div = (1.0 - sim) * maskf
        if yd_precision == "split3":
            # manual bf16x2 split, 3 single-pass dots: each operand is
            # hi (= bf16 round, exact under the MXU's single-pass
            # product) + lo (residual, itself bf16-rounded inside the
            # dot, ~2^-25 relative); the dropped lo·lo term is ~2^-32.
            # Mosaic lowers only DEFAULT/HIGHEST, so the 3-pass middle
            # ground (Precision.HIGH raises NotImplementedError) has to
            # be spelled out.  ~1e-7 relative vs the f64 oracle —
            # measured on-chip by tools/check_device_oracle.py.
            wd_hi = wd.astype(jnp.bfloat16).astype(jnp.float32)
            wd_lo = wd - wd_hi
            dv_hi = div.astype(jnp.bfloat16).astype(jnp.float32)
            dv_lo = div - dv_hi

            def _dd(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            yd = _dd(wd_hi, dv_hi) + _dd(wd_hi, dv_lo) + _dd(wd_lo, dv_hi)
        else:
            yd = jax.lax.dot_general(
                wd, div, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=yd_precision)
        # yp operands are all 0/1 indicators — the MXU default single-pass
        # bf16 product is exact for them (idgroup.py precision note)
        yp = jax.lax.dot_general(
            wp, maskf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        def rowdot(x, y):
            return jnp.sum(x * y, axis=1, keepdims=True)

        o_pi[:] = rowdot(yd[:r_count], w_all)
        o_pu[:] = rowdot(yp[:pq], seeds_acc[:pq])
        yd_a = yd[r_count:r_count + q]
        yd_b = yd[r_count + q:r_count + 2 * q]
        yp_a = yp[pq:pq + q]
        yp_b = yp[pq + q:pq + 2 * q]
        o_saa[:] = rowdot(yd_a, ma)
        o_caa[:] = rowdot(yp_a, ma)
        o_sbb[:] = rowdot(yd_b, mb)
        o_cbb[:] = rowdot(yp_b, mb)
        o_sab[:] = rowdot(yd_a, mb)
        o_cab[:] = rowdot(yp_a, mb)
        # grouped-Hudson Dxy: gather the A-side yd rows and B-side weight
        # rows by their static indices (panel rows when pairs are
        # disjoint, stripped-side rows otherwise)
        ia = pair_a if disjoint else tuple(range(pq, pq + q))
        ib = pair_b if disjoint else tuple(range(pq + q, pq + 2 * q))
        yd_ga = jnp.concatenate([yd[i:i + 1] for i in ia], axis=0)
        wgb = jnp.concatenate([w_all[i:i + 1] for i in ib], axis=0)
        o_gd[:] = rowdot(yd_ga, wgb)

        # seed_risk (fused_panel_stats semantics): ANY two seeds (union
        # over the stack) with no data.  The column orientation of the
        # seeds-any vector comes from one exact identity dot — Mosaic has
        # no cheap 2-D transpose.
        seeds_any = jnp.max(seeds_acc[:], axis=0, keepdims=True)  # [1, N]
        eye_f = jnp.where(row_ids == col_ids, 1.0, 0.0)
        seeds_col = jax.lax.dot_general(
            eye_f, seeds_any, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [N, 1]
        gap = (1.0 - presf) * jnp.where(row_ids == col_ids, 0.0, 1.0)
        t2 = jnp.max(gap * seeds_any, axis=1, keepdims=True)  # [N, 1]
        risk_ref[0, 0] = jnp.max(seeds_col * t2)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("pair_a", "pair_b", "pairs_disjoint", "block",
                     "stages", "yd_precision", "peel_unroll"))
def window_stats_pallas(geno, member, site_mask, pmasks_stack, mask_a,
                        mask_b, threshold, length,
                        pair_a: tuple, pair_b: tuple,
                        pairs_disjoint: bool, block: int = 256,
                        stages: int = 5, yd_precision=_HI,
                        peel_unroll: int = 2):
    """One biallelic window in, every panel/pair statistic out — one kernel.

    Args:
      geno:         [N, S] int8 0/1 alleles, -1 missing (N % block == 0,
                    block % 128 == 0; S % 128 == 0)
      member:       [N] bool
      site_mask:    [S] bool
      pmasks_stack: [R, N] bool grouping mask stack
                    (stats.panelstats.panel_mask_stack order)
      mask_a/mask_b:[Q, N] bool overlap-stripped Hudson sides
      threshold:    scalar f32 (strict > link rule)
      length:       scalar f32 window length in bp
      pair_a/pair_b: STATIC tuples of panel indices (python ints)
      pairs_disjoint: static; selects where the grouped-Hudson weight
                    rows come from (panel rows vs stripped-side rows)
    Returns a dict of f32 arrays:
      quad [PQ], n [R], num_groups [R], pairs_used2 [PQ],
      sum_aa/cnt_aa/sum_bb/cnt_bb/sum_ab/cnt_ab [Q] (UNSCALED row-dots —
      callers apply the 0.5 factors), gpi_a/gpi_b/gdxy [Q] (raw dots, no
      Bessel), s f32 scalar, seed_risk f32 scalar.
    """
    n_cap, s_cap = geno.shape
    r_count = pmasks_stack.shape[0]
    q = mask_a.shape[0]
    pq = r_count - (0 if pairs_disjoint else 2 * q)
    assert n_cap % block == 0 and block % 128 == 0 and n_cap % _KB == 0
    assert len(pair_a) == q and len(pair_b) == q and q >= 1

    g2 = jnp.where(site_mask[None, :] & member[:, None], geno, jnp.int8(-1))
    v = (g2 >= 0).astype(jnp.bfloat16)
    a = jnp.maximum(g2, 0).astype(jnp.bfloat16)
    z = a + a - v  # +1 alt / -1 ref / 0 invalid
    member_f = member.astype(jnp.float32)[None, :]
    pm_f = (pmasks_stack & member[None, :]).astype(jnp.float32)
    ma_f = mask_a.astype(jnp.float32)
    mb_f = mask_b.astype(jnp.float32)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)
    len_v = jnp.asarray(length, jnp.float32).reshape(1, 1)

    def vspec(rows):
        return pl.BlockSpec((rows, 1), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)

    def vshape(rows):
        return jax.ShapeDtypeStruct((rows, 1), jnp.float32)

    sm = pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM)
    smshape = jax.ShapeDtypeStruct((1, 1), jnp.float32)

    outs = pl.pallas_call(
        _make_kernel(n_cap, block, r_count, pq, q, tuple(pair_a),
                     tuple(pair_b), pairs_disjoint, stages, yd_precision,
                     peel_unroll),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_cap, s_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_count, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            sm, sm,
        ],
        out_specs=[
            vspec(r_count), vspec(r_count), vspec(r_count), vspec(pq),
            vspec(q), vspec(q), vspec(q), vspec(q), vspec(q), vspec(q),
            vspec(q), sm, sm,
        ],
        out_shape=[
            vshape(r_count), vshape(r_count), vshape(r_count), vshape(pq),
            vshape(q), vshape(q), vshape(q), vshape(q), vshape(q),
            vshape(q),
            vshape(q), smshape, smshape,
        ],
        scratch_shapes=[
            pltpu.VMEM((r_count, n_cap), jnp.float32),
            pltpu.VMEM((r_count, n_cap), jnp.int32),
            pltpu.VMEM((r_count, n_cap), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(4 * n_cap * n_cap * s_cap
                   + 8 * r_count * n_cap * n_cap
                   + 4 * (pq + 4 * q) * n_cap * n_cap),
            bytes_accessed=2 * n_cap * s_cap + 8 * r_count * n_cap,
            transcendentals=0,
        ),
    )(z, member_f, pm_f, ma_f, mb_f, thr, len_v)

    (o_pi, o_n, o_ng, o_pu, o_saa, o_caa, o_sbb, o_cbb, o_sab, o_cab,
     o_gd, s_out, risk) = outs
    return {
        # quad covers ALL R grouping rows: [:PQ] are the π quadratic
        # forms, the trailing rows (non-disjoint) / the pair_a/pair_b
        # rows (disjoint) double as the grouped-Hudson within forms
        "quad": o_pi[:, 0], "n": o_n[:, 0], "num_groups": o_ng[:, 0],
        "pairs_used2": o_pu[:, 0],
        "sum_aa": o_saa[:, 0], "cnt_aa": o_caa[:, 0],
        "sum_bb": o_sbb[:, 0], "cnt_bb": o_cbb[:, 0],
        "sum_ab": o_sab[:, 0], "cnt_ab": o_cab[:, 0],
        "gdxy": o_gd[:, 0],
        "s": s_out[0, 0], "seed_risk": risk[0, 0],
    }
