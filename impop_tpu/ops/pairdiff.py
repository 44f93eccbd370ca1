"""Pallas TPU kernel: fused pairwise-difference / identity matrix.

The innermost data-path op of the engine: [N, S] int8 allele codes →
[N, N] estimated-identity matrix + presence mask (the capability of
``impg similarity``, computed from variant matrices instead of pairwise
sequence alignment — SURVEY.md §2.2).

The XLA path (stats/allele.py) materialises the validity mask, the masked
allele matrix and its complement in HBM before two Gram matmuls.  This
kernel tiles the [N, N] output over the MXU and streams S-chunks of the
int8 tile through VMEM, building the f32 operands on the fly — the int8
input is read once per output tile pair and nothing else touches HBM:

    diff[i,j]     = Σ_s  x_i(1-x_j) + (1-x_i)x_j   over mutually-valid s
    compared[i,j] = Σ_s  valid_i · valid_j
    sim[i,j]      = 1 - diff/length   where compared > 0  (diag forced 1)

Grid: (N/Ti, N/Tj, S/Ts) with an accumulator in VMEM scratch, masked
finalisation on the last S-step.  Biallelic (0/1, -1 missing) codes.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_identity_pallas", "pairwise_identity_xla"]


def _kernel(xi_ref, xj_ref, w_ref, mi_ref, mj_ref, len_ref,
            sim_ref, pres_ref, acc_diff, acc_cmp, *, operand_dtype):
    """One (Ti, Tj) output tile, accumulating over the S grid axis."""
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _():
        acc_diff[:] = jnp.zeros_like(acc_diff)
        acc_cmp[:] = jnp.zeros_like(acc_cmp)

    # int8 compares are unsupported on the VPU — widen to f32 first
    xi = xi_ref[:].astype(jnp.float32)  # [Ti, Ts]
    xj = xj_ref[:].astype(jnp.float32)  # [Tj, Ts]
    w = w_ref[:]                        # [1, Ts] per-site diff weights
    vi = (xi >= 0).astype(jnp.float32)
    vj = (xj >= 0).astype(jnp.float32)
    ai = xi * vi  # alleles, zeroed at invalid sites (codes are 0/1/-1)
    aj = xj * vj
    ci = vi - ai  # complement within valid sites
    cj = vj - aj

    # diff += (ai·w)·cjᵀ + (ci·w)·ajᵀ ; compared += vi·vjᵀ   (all MXU).
    # With unit weights every operand is a 0/1 indicator, so bf16 inputs
    # with f32 accumulation are EXACT (counts stay < 2^24) and run at the
    # MXU's native bf16 rate instead of multi-pass f32 (operand_dtype is
    # selected by the caller; non-unit site weights keep f32).
    def dt(x):
        return x.astype(operand_dtype)

    # HIGHEST: the weighted operands carry indel base lengths (values
    # > 256 are not bf16-exact and the MXU's default f32 matmul is
    # single-pass bf16); the 0/1 compared-count dot stays DEFAULT
    acc_diff[:] += (
        jax.lax.dot_general(dt(ai * w), dt(cj), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        + jax.lax.dot_general(dt(ci * w), dt(aj), (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    )
    acc_cmp[:] += jax.lax.dot_general(dt(vi), dt(vj), (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(s_idx == n_s - 1)
    def _():
        mi = mi_ref[0, :]  # [Ti] member mask (row block)
        mj = mj_ref[0, :]  # [Tj]
        length = len_ref[0, 0]
        cmp_ = acc_cmp[:]
        present = (cmp_ > 0) & (mi[:, None] > 0) & (mj[None, :] > 0)
        sim = jnp.where(
            present, 1.0 - acc_diff[:] / jnp.maximum(length, 1.0), 0.0
        )
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        block = sim.shape[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0) + ti * block
        col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + tj * block
        diag = (row_ids == col_ids) & (mi[:, None] > 0)
        sim_ref[:] = jnp.where(diag, 1.0, sim)
        pres_ref[:] = (present | diag).astype(jnp.int8)


def _make_kernel_tri_resident(pairs, tn):
    """Statically-unrolled triangular z-Gram with the operand column
    RESIDENT in VMEM.

    The streaming triangular kernel re-reads each z row-block once per
    tile pair, so at [512, 8192] its HBM operand traffic is ~3× the
    matrix size and the MXU stalls on it (measured 21.5 Tcells/s,
    ~33% hw MFU).  Here the grid is (k,) alone: one [N, Ts] column of z
    is fetched per step and ALL i ≤ j tile pairs are unrolled statically
    inside it, slicing their row blocks out of the resident column — z
    crosses HBM exactly once per window, there is no scalar prefetch, no
    dynamic indexing, and Mosaic can software-pipeline the whole dot
    sequence.  Per-pair accumulators ([P, tn, tn] f32 ×2, statically
    indexed) and the [N, N] outputs stay in VMEM until the final
    write-back — fits (with a double-buffered operand column) for
    N ≤ 512, which covers every scan shape (HPRC is N=466+ref; larger N
    takes the streaming kernel / pair-shard path).  When Ts == S the
    grid is a single step and the accumulator round-trips vanish
    entirely.
    """

    def kernel(z_ref, m_ref, len_ref, sim_ref, pres_ref, accs_zz, accs_vv):
        k = pl.program_id(0)
        n_k = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            accs_zz[:] = jnp.zeros_like(accs_zz)
            accs_vv[:] = jnp.zeros_like(accs_vv)

        dims = (((1,), (1,)), ((), ()))
        t_blocks = max(i for _, i in pairs) + 1 if pairs else 0
        # hoist |z| per row block: each block appears in ~T pairs, and the
        # per-pair abs was ~1/3 of the MXU's own time on the VPU at
        # [512, 8192] (20 abs/step -> 4)
        z_blocks = [z_ref[b * tn:(b + 1) * tn, :] for b in range(t_blocks)]
        v_blocks = [jnp.abs(zb) for zb in z_blocks]
        for p, (i, j) in enumerate(pairs):
            accs_zz[p] += jax.lax.dot_general(
                z_blocks[i], z_blocks[j], dims,
                preferred_element_type=jnp.float32)
            accs_vv[p] += jax.lax.dot_general(
                v_blocks[i], v_blocks[j], dims,
                preferred_element_type=jnp.float32)

        @pl.when(k == n_k - 1)
        def _():
            length = len_ref[0, 0]
            for p, (i, j) in enumerate(pairs):
                mi = m_ref[0, i * tn:(i + 1) * tn]
                mj = m_ref[0, j * tn:(j + 1) * tn]
                cmp_ = accs_vv[p]
                diff = (cmp_ - accs_zz[p]) * 0.5
                present = ((cmp_ > 0) & (mi[:, None] > 0)
                           & (mj[None, :] > 0))
                sim = jnp.where(
                    present, 1.0 - diff / jnp.maximum(length, 1.0), 0.0)
                row_ids = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
                           + i * tn)
                col_ids = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
                           + j * tn)
                diag = (row_ids == col_ids) & (mi[:, None] > 0)
                sim_ref[i * tn:(i + 1) * tn, j * tn:(j + 1) * tn] = (
                    jnp.where(diag, 1.0, sim))
                pres_ref[i * tn:(i + 1) * tn, j * tn:(j + 1) * tn] = (
                    (present | diag).astype(jnp.int8))

    return kernel


def _kernel_tri(it_ref, jt_ref, z_i_ref, z_j_ref, mi_ref, mj_ref, len_ref,
                sim_ref, pres_ref, acc_zz, acc_vv):
    """Unit-weight i ≤ j tile on PRE-BUILT bf16 z operands: two MXU
    matmuls and nothing else.  z = +1 (valid alt) / -1 (valid ref) /
    0 (invalid); v = |z| is rebuilt on the VPU (one abs per operand cell
    — negligible next to the tn² MXU flops per cell, and it halves the
    operand HBM traffic vs streaming a separate v).  z·zᵀ = agreements −
    differences over mutually-valid sites, so diff = (v·vᵀ − z·zᵀ)/2
    exactly (±1/0 are exact in bf16, counts < 2^24 exact in the f32
    accumulator).

    TRIANGULAR pair-space schedule: the output is symmetric (diff and
    compared both are), so the grid enumerates only the T(T+1)/2 tile
    pairs with i ≤ j — scalar-prefetched (it, jt) index tables — instead
    of all T² blocks; the strict-lower half is mirrored by the caller's
    cheap [N, N] transpose-select epilogue.  ~2× useful-FLOP at large T
    (the reference's `impg similarity` computes every unordered pair once
    for the same reason, run_pica2_impg.sh:162-168)."""
    p = pl.program_id(0)
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s_idx == 0)
    def _():
        acc_zz[:] = jnp.zeros_like(acc_zz)
        acc_vv[:] = jnp.zeros_like(acc_vv)

    zi = z_i_ref[:]
    zj = z_j_ref[:]
    acc_zz[:] += jax.lax.dot_general(
        zi, zj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_vv[:] += jax.lax.dot_general(
        jnp.abs(zi), jnp.abs(zj), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s_idx == n_s - 1)
    def _():
        mi = mi_ref[0, :]
        mj = mj_ref[0, :]
        length = len_ref[0, 0]
        cmp_ = acc_vv[:]
        diff = (cmp_ - acc_zz[:]) * 0.5
        present = (cmp_ > 0) & (mi[:, None] > 0) & (mj[None, :] > 0)
        sim = jnp.where(present, 1.0 - diff / jnp.maximum(length, 1.0), 0.0)
        block = sim.shape[0]
        row_ids = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
                   + it_ref[p] * block)
        col_ids = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
                   + jt_ref[p] * block)
        diag = (row_ids == col_ids) & (mi[:, None] > 0)
        sim_ref[:] = jnp.where(diag, 1.0, sim)
        pres_ref[:] = (present | diag).astype(jnp.int8)


def _kernel_i8(zi_ref, zj_ref, vi_ref, vj_ref, mi_ref, mj_ref, len_ref,
               sim_ref, pres_ref, acc_zz, acc_vv):
    """Unit-weight tile: two INT8 MXU Gram matmuls, no in-kernel prep.

    With z = +1 (valid alt), -1 (valid ref), 0 (invalid) and v = validity,
    z·zᵀ counts (agreements − differences) over mutually-valid sites and
    v·vᵀ counts comparisons, so diff = (v·vᵀ − z·zᵀ)/2 exactly (integer
    math; int8 operands run the MXU at twice the bf16 rate and the three
    f32-prep matmuls of the weighted kernel collapse to two)."""
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _():
        acc_zz[:] = jnp.zeros_like(acc_zz)
        acc_vv[:] = jnp.zeros_like(acc_vv)

    acc_zz[:] += jax.lax.dot_general(
        zi_ref[:], zj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_vv[:] += jax.lax.dot_general(
        vi_ref[:], vj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(s_idx == n_s - 1)
    def _():
        mi = mi_ref[0, :]
        mj = mj_ref[0, :]
        length = len_ref[0, 0]
        cmp_ = acc_vv[:].astype(jnp.float32)
        diff = (cmp_ - acc_zz[:].astype(jnp.float32)) * 0.5
        present = (acc_vv[:] > 0) & (mi[:, None] > 0) & (mj[None, :] > 0)
        sim = jnp.where(present, 1.0 - diff / jnp.maximum(length, 1.0), 0.0)
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        block = sim.shape[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0) + ti * block
        col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + tj * block
        diag = (row_ids == col_ids) & (mi[:, None] > 0)
        sim_ref[:] = jnp.where(diag, 1.0, sim)
        pres_ref[:] = (present | diag).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_s"))
def _pairwise_identity_pallas_i8(geno, member, site_mask, length,
                                 tile_n, tile_s):
    n, s = geno.shape
    geno = jnp.where(site_mask[None, :], geno, jnp.int8(-1))
    # operand prep ONCE in XLA (one fused elementwise pass over [N, S])
    # instead of per output tile inside the kernel: the old kernel rebuilt
    # f32 operands N/tile_n times each and the VPU prep throttled the MXU
    v = (geno >= 0).astype(jnp.int8)
    m = jnp.maximum(geno, 0).astype(jnp.int8)
    z = (m + m - v).astype(jnp.int8)   # +1 alt / -1 ref / 0 invalid
    member_f = member.astype(jnp.float32)[None, :]
    length_v = jnp.asarray(length, jnp.float32).reshape(1, 1)

    grid = (n // tile_n, n // tile_n, s // tile_s)
    sim, pres = pl.pallas_call(
        _kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_s), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_s), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_s), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_s), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, tile_n), jnp.int32),
            pltpu.VMEM((tile_n, tile_n), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n * s,
            bytes_accessed=4 * n * s + 5 * n * n,
            transcendentals=0,
        ),
    )(z, z, v, v, member_f, member_f, length_v)
    return sim, pres.astype(bool)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_s"))
def pairwise_identity_pallas(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    length: jnp.ndarray,
    tile_n: int = 256,
    tile_s: int = 512,
    site_weights: jnp.ndarray | None = None,
):
    """Fused identity matrix for one window.

    Args:
      geno:      [N, S] int8, 0/1 alleles, -1 missing (N, S multiples of the
                 tile sizes; pad with -1 / False)
      member:    [N] bool
      site_mask: [S] bool
      length:    scalar f32 window length in bp
      site_weights: optional [S] f32 per-site diff weights (column-mode
                 identity, doc/how_stats.md); None = unit weights
    Returns:
      (sim [N, N] f32, present [N, N] bool)
    """
    n, s = geno.shape
    tile_n = min(tile_n, n)
    tile_s = min(tile_s, s)
    assert n % tile_n == 0 and s % tile_s == 0

    if site_weights is None and os.environ.get("IMPOP_TPU_I8_IDENTITY") == "1":
        # int8 formulation (two int8 Gram matmuls, exact): OPT-IN — on this
        # backend every program containing an int8 dot, Pallas OR plain
        # XLA, wedges the remote compile service indefinitely (four
        # independent hangs >10 min).  tools/bench_pairwise.py is the A/B
        # harness for backends whose compiler handles int8 matmuls.
        return pairwise_identity_xla_i8(geno, member, site_mask, length)

    # invalid sites are already -1; apply the site mask once on the way in
    geno = jnp.where(site_mask[None, :], geno, jnp.int8(-1))
    member_f = member.astype(jnp.float32)[None, :]  # [1, N] for SMEM-friendly 2D
    length_v = jnp.asarray(length, jnp.float32).reshape(1, 1)

    if site_weights is None:
        # unit weights: one fused XLA prep pass + the matmul-pure z
        # kernel on a TRIANGULAR (i <= j) tile-pair grid.  tn trades tile
        # efficiency against triangle coverage: executed-FLOP ratio is
        # (T+1)/2T for T = n/tn tiles, so smaller tiles skip more of the
        # redundant lower half (measured on v5e: tn=128 beats 256).
        v = (geno >= 0).astype(jnp.bfloat16)
        a = jnp.maximum(geno, 0).astype(jnp.bfloat16)
        z = a + a - v  # +1 alt / -1 ref / 0 invalid
        tn = int(os.environ.get("IMPOP_TPU_TRI_TILE", 0)) or \
            next((t for t in (128, 256) if n % t == 0), tile_n)
        assert n % tn == 0
        t_blocks = n // tn
        pairs = [(i, j) for i in range(t_blocks)
                 for j in range(i, t_blocks)]
        it_arr = jnp.asarray([i for i, _ in pairs], jnp.int32)
        jt_arr = jnp.asarray([j for _, j in pairs], jnp.int32)
        out_shape = [
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.int8),
        ]
        cost = pl.CostEstimate(
            flops=4 * len(pairs) * tn * tn * s,
            bytes_accessed=2 * n * s + 5 * n * n,
            transcendentals=0,
        )
        if n <= 512:
            # resident variant: z crosses HBM once, tile pairs statically
            # unrolled (see _make_kernel_tri_resident).  The site chunk is
            # as large as the VMEM budget allows — at the bench shape
            # [512, 8192] the whole operand fits and the grid is ONE step.
            ts_budget = int(os.environ.get("IMPOP_TPU_TRI_TS", 0)) or \
                (6 * 1024 * 1024) // (2 * n)
            ts = s
            while ts > tile_s and ts > ts_budget:
                ts //= 2
            while s % ts != 0:
                ts //= 2
            ts = max(ts, 128)
            sim_u, pres_u = pl.pallas_call(
                _make_kernel_tri_resident(pairs, tn),
                grid=(s // ts,),
                in_specs=[
                    pl.BlockSpec((n, ts), lambda k: (0, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n), lambda k: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda k: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((n, n), lambda k: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, n), lambda k: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((len(pairs), tn, tn), jnp.float32),
                    pltpu.VMEM((len(pairs), tn, tn), jnp.float32),
                ],
                cost_estimate=cost,
            )(z, member_f, length_v)
        else:
            # streaming fallback for pair-space shapes past the VMEM
            # budget: operand row-blocks re-fetched per tile pair
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(len(pairs), s // tile_s),
                in_specs=[
                    pl.BlockSpec((tn, tile_s),
                                 lambda p, k, it, jt: (it[p], k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, tile_s),
                                 lambda p, k, it, jt: (jt[p], k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tn), lambda p, k, it, jt: (0, it[p]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tn), lambda p, k, it, jt: (0, jt[p]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda p, k, it, jt: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((tn, tn),
                                 lambda p, k, it, jt: (it[p], jt[p]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, tn),
                                 lambda p, k, it, jt: (it[p], jt[p]),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((tn, tn), jnp.float32),
                    pltpu.VMEM((tn, tn), jnp.float32),
                ],
            )
            sim_u, pres_u = pl.pallas_call(
                _kernel_tri,
                grid_spec=grid_spec,
                out_shape=out_shape,
                cost_estimate=cost,
            )(it_arr, jt_arr, z, z, member_f, member_f, length_v)
        # mirror the strict-lower half from the computed upper blocks;
        # unwritten lower blocks of sim_u/pres_u are never selected (for
        # any cell with col < row the transposed read lands in a written
        # i <= j block: floor is monotone, so col < row ⇒ bc <= br)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        upper = col >= row
        sim = jnp.where(upper, sim_u, sim_u.T)
        pres = jnp.where(upper, pres_u, pres_u.T)
        return sim, pres.astype(bool)

    w = site_weights.astype(jnp.float32).reshape(1, s)

    # weighted (column-mode) path: arbitrary weights must keep f32
    # (indel base lengths are small ints, but the bf16-exactness guarantee
    # is per-value); the in-kernel prep stays because aw/cw double the
    # operand streams and this path is the rare one
    operand_dtype = jnp.float32

    grid = (n // tile_n, n // tile_n, s // tile_s)
    sim, pres = pl.pallas_call(
        functools.partial(_kernel, operand_dtype=operand_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_s), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_s), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_n), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, tile_n), jnp.float32),
            pltpu.VMEM((tile_n, tile_n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * n * s,
            bytes_accessed=2 * n * s + 5 * n * n,
            transcendentals=0,
        ),
    )(geno, geno, w, member_f, member_f, length_v)
    return sim, pres.astype(bool)


@jax.jit
def pairwise_identity_xla_i8(geno, member, site_mask, length):
    """Pure-XLA int8 MXU formulation (A/B alternative to the Pallas i8
    kernel): same z/v operands and (v·vᵀ − z·zᵀ)/2 identity, lowered by
    XLA's own int8 dot path.  Two [N, S] int8 reads + two int32 [N, N]
    products; exact integer math."""
    geno = jnp.where(site_mask[None, :], geno, jnp.int8(-1))
    v = (geno >= 0).astype(jnp.int8)
    m = jnp.maximum(geno, 0).astype(jnp.int8)
    z = (m + m - v).astype(jnp.int8)
    dims = (((1,), (1,)), ((), ()))
    zz = jax.lax.dot_general(z, z, dims, preferred_element_type=jnp.int32)
    vv = jax.lax.dot_general(v, v, dims, preferred_element_type=jnp.int32)
    diff = (vv - zz).astype(jnp.float32) * 0.5
    present = (vv > 0) & member[:, None] & member[None, :]
    length = jnp.asarray(length, jnp.float32)
    sim = jnp.where(present, 1.0 - diff / jnp.maximum(length, 1.0), 0.0)
    eye = jnp.eye(member.shape[0], dtype=bool)
    diag = eye & member[:, None]
    return jnp.where(diag, 1.0, sim), present | diag


def pairwise_identity_xla(geno, member, site_mask, length):
    """The reference XLA formulation (stats/allele.identity_from_alleles) —
    kept here for A/B benchmarking against the Pallas kernel."""
    from impop_tpu.stats.allele import identity_from_alleles

    return identity_from_alleles(geno, member, site_mask, length)
