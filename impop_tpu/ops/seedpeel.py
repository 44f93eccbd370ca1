"""Pallas TPU kernel: fused greedy-grouping seed determination.

Computes, for P panel masks over one window's [N, N] similarity matrix, the
pica2 greedy seed set (stats/grouping.py semantics: seed(i) ⟺ no seed j < i
with link(j, i), rows processed in ascending index — SURVEY.md §3.5,
pica2.py:98-110 with the documented deterministic sorted order).

The XLA formulation (grouping.greedy_group_panels) runs a fori_loop of
chunk matvecs with an inner frontier-peel while_loop — ~180 small kernels
per 320-window batch, ~11 ms of pure dispatch/launch overhead on v5e.
This kernel fuses the whole recurrence into ONE program:

  grid = (C,) over column chunks of width K (plus the vmap batch dim).
  VMEM scratch carries the accumulated seed flags [P, N] f32 across chunks.
  Per chunk c:
    elink block  [N, K]  built in-register from sim/present/member blocks
    absorbed_ext [P, K]  = seeds_scratch @ elink_block        (MXU)
    in-chunk     [K, K]  diagonal block (own BlockSpec (c, c) — no dynamic
                         slicing), frontier-peeled with an in-kernel
                         while_loop: each round decides every row whose
                         earlier in-chunk neighbours are decided
    seed chunk written to scratch and to the output block.

The link matrix is built from sim exactly as the XLA path does
(strict > threshold), so results are bit-identical to greedy_group_panels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["seed_peel_pallas"]


def _kernel(sim_ref, pres_ref, simd_ref, presd_ref, mrow_ref, mcol_ref,
            pm_ref, thr_ref, seed_ref, seeds_acc):
    c = pl.program_id(0)
    n_cap = sim_ref.shape[0]
    block = sim_ref.shape[1]

    @pl.when(c == 0)
    def _():
        seeds_acc[:] = jnp.zeros_like(seeds_acc)

    thr = thr_ref[0, 0]
    mrow = mrow_ref[0, :]                      # [N] f32 member (rows)
    mcol = mcol_ref[0, :]                      # [K] f32 member (this chunk)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cap, block), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cap, block), 1) + c * block

    # int8 compares are unsupported on the VPU — widen to f32 first
    elink = jnp.where(
        (sim_ref[:] > thr) & (pres_ref[:].astype(jnp.float32) > 0)
        & (mrow[:, None] > 0) & (mcol[None, :] > 0)
        & (row_ids < col_ids),
        1.0, 0.0,
    )                                          # [N, K] f32

    absorbed_ext = jax.lax.dot_general(
        seeds_acc[:], elink, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) > 0.5                                    # [P, K]

    # diagonal [K, K] block: rows c*K..c*K+K of this chunk's columns
    drow = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    dcol = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    in_chunk = jnp.where(
        (simd_ref[:] > thr) & (presd_ref[:].astype(jnp.float32) > 0)
        & (mcol[:, None] > 0) & (mcol[None, :] > 0)
        & (drow < dcol),
        1.0, 0.0,
    )                                          # [K, K] f32, r < r'

    pm_c = pm_ref[:]                           # [P, K] f32 0/1
    p_count = pm_c.shape[0]
    absorbed_ext_f = jnp.where(absorbed_ext, 1.0, 0.0)

    # Frontier peel with two refinements over the XLA formulation:
    # rows absorbed by a *known* seed are decided immediately (a clique
    # resolves in 2 rounds instead of |clique| rounds), and the two
    # per-round reductions share one stacked [2P, K] @ [K, K] matmul.
    # Loop state is carried as f32 0/1 masks: Mosaic cannot legalize i1
    # vector loop carries (scf.yield on vector<i1>).
    def peel_round(state):
        decided_f, seed_cf = state
        undecided = pm_c * (1.0 - decided_f)
        hits = jax.lax.dot_general(
            jnp.concatenate([undecided, seed_cf], axis=0), in_chunk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        blocked = hits[:p_count] > 0.5
        absorbed = jnp.maximum(
            absorbed_ext_f, jnp.where(hits[p_count:] > 0.5, 1.0, 0.0)
        )
        frontier = undecided * jnp.where(blocked, 0.0, 1.0)
        new_seed = frontier * (1.0 - absorbed)
        return (
            jnp.maximum(decided_f, jnp.maximum(frontier, undecided * absorbed)),
            jnp.maximum(seed_cf, new_seed),
        )

    def peel_cond(state):
        decided_f, _ = state
        return jnp.max(pm_c * (1.0 - decided_f)) > 0.5

    def peel_body(state):
        # two rounds per scalar-cond sync (the cond's vector->scalar
        # reduction is the expensive part; an extra converged round is a
        # cheap no-op)
        return peel_round(peel_round(state))

    _, seed_f = jax.lax.while_loop(
        peel_cond, peel_body,
        (1.0 - pm_c, jnp.zeros_like(pm_c)),
    )
    seed_ref[:] = seed_f
    seeds_acc[:, pl.ds(c * block, block)] = seed_f


@functools.partial(jax.jit, static_argnames=("block",))
def seed_peel_pallas(sim, present, member, pmasks, threshold, block=256):
    """Greedy seed flags for P panels of one window.

    Args:
      sim:     [N, N] f32 symmetric similarities
      present: [N, N] bool pair-has-data mask
      member:  [N] bool
      pmasks:  [P, N] bool panel masks
      threshold: scalar f32 (strict > link rule)
      block: chunk width (N must be a multiple of it and it of 128 —
             Mosaic needs lane-aligned dynamic VMEM scratch stores;
             256 measured ~5 us/window faster than 128 at [512] x 15
             masks on v5e: half the sequential chunk round-trips.  An
             in-kernel fused gid output was tried and REVERTED: the
             per-panel [N, K] masked-min unroll cost ~7 us/window, more
             than the external elink+einsum argmin it replaced — r4
             A/B log, tools/bench_panelstep.py)
    Returns:
      seed [P, N] bool — True where the row is its panel-group's seed.
    """
    n_cap = member.shape[0]
    p_count = pmasks.shape[0]
    assert n_cap % block == 0 and block % 128 == 0
    grid = (n_cap // block,)

    member_f = member.astype(jnp.float32)[None, :]         # [1, N]
    pm_f = (pmasks & member[None, :]).astype(jnp.float32)  # [P, N]
    pres_i8 = present.astype(jnp.int8)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    seed_f = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_cap, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),          # sim columns
            pl.BlockSpec((n_cap, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),          # present columns
            pl.BlockSpec((block, block), lambda c: (c, c),
                         memory_space=pltpu.VMEM),          # sim diagonal
            pl.BlockSpec((block, block), lambda c: (c, c),
                         memory_space=pltpu.VMEM),          # present diagonal
            pl.BlockSpec((1, n_cap), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),          # member rows
            pl.BlockSpec((1, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),          # member chunk
            pl.BlockSpec((p_count, block), lambda c: (0, c),
                         memory_space=pltpu.VMEM),          # pm chunk
            pl.BlockSpec((1, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),          # threshold
        ],
        out_specs=pl.BlockSpec((p_count, block), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_count, n_cap), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p_count, n_cap), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_count * n_cap * n_cap,
            bytes_accessed=2 * 5 * n_cap * n_cap,
            transcendentals=0,
        ),
    )(sim, pres_i8, sim, pres_i8, member_f, member_f, pm_f, thr)
    return seed_f > 0.5
