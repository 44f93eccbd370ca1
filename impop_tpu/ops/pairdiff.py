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

    acc_diff[:] += (
        jax.lax.dot_general(dt(ai * w), dt(cj), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(dt(ci * w), dt(aj), (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
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


def _kernel_prepped(zi_ref, zj_ref, vi_ref, vj_ref,
                    mi_ref, mj_ref, len_ref, sim_ref, pres_ref,
                    acc_zz, acc_vv):
    """Unit-weight tile on PRE-BUILT bf16 z/v operands: two MXU matmuls
    and nothing else.  z = +1 (valid alt) / -1 (valid ref) / 0 (invalid),
    v = validity; z·zᵀ = agreements − differences over mutually-valid
    sites, so diff = (v·vᵀ − z·zᵀ)/2 exactly (±1/0 are exact in bf16,
    counts < 2^24 exact in the f32 accumulator).

    Two design points vs the general kernel: the one elementwise prep
    pass runs in XLA (the general kernel re-prepped f32 operands on the
    VPU inside every (i, j) output tile — ~3x the MXU's own time at
    [512, 8192]); and two operand streams of 2 B/cell keep the kernel
    MXU-bound instead of HBM-bound (a 3-stream a/c/v variant measured
    ~25% MFU where this formulation reaches higher)."""
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _():
        acc_zz[:] = jnp.zeros_like(acc_zz)
        acc_vv[:] = jnp.zeros_like(acc_vv)

    acc_zz[:] += jax.lax.dot_general(
        zi_ref[:], zj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_vv[:] += jax.lax.dot_general(
        vi_ref[:], vj_ref[:], (((1,), (1,)), ((), ())),
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
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        block = sim.shape[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0) + ti * block
        col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + tj * block
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
        # unit weights: one fused XLA prep pass + the matmul-pure z/v
        # kernel.  Large 512-row tiles so operand row-blocks stream into
        # VMEM once per grid column instead of once per output tile.
        v = (geno >= 0).astype(jnp.bfloat16)
        a = jnp.maximum(geno, 0).astype(jnp.bfloat16)
        z = a + a - v  # +1 alt / -1 ref / 0 invalid
        # prefer large MXU-friendly tiles; fall back to the caller's tile_n
        # for small/odd N (n % tile_n == 0 is asserted above) instead of
        # raising StopIteration on e.g. n = 64
        tn = next((t for t in (512, 256, 128) if n % t == 0), tile_n)
        grid = (n // tn, n // tn, s // tile_s)
        op_spec_i = pl.BlockSpec((tn, tile_s), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM)
        op_spec_j = pl.BlockSpec((tn, tile_s), lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM)
        sim, pres = pl.pallas_call(
            _kernel_prepped,
            grid=grid,
            in_specs=[
                op_spec_i, op_spec_j, op_spec_i, op_spec_j,
                pl.BlockSpec((1, tn), lambda i, j, k: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((tn, tn), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, tn), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, n), jnp.float32),
                jax.ShapeDtypeStruct((n, n), jnp.int8),
            ],
            scratch_shapes=[
                pltpu.VMEM((tn, tn), jnp.float32),
                pltpu.VMEM((tn, tn), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * n * n * s,
                bytes_accessed=4 * n * s + 5 * n * n,
                transcendentals=0,
            ),
        )(z, z, v, v, member_f, member_f, length_v)
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
