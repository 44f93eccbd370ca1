"""Pallas TPU kernel: bidirectional EHH decay areas, VMEM-resident.

The XLA formulation of the dynamic-focal death-site computation
(stats/ehh.ehh_area_dynamic) carries [N, N] per-16-site-block min/max
intermediates through HBM — vmapped over a scan batch that is ~64 MB of
traffic per window, measured 198 µs/window on v5e (bench ehh_fused,
5 051 win/s).  This kernel keeps the [N, N] death/steps working set in
VMEM across the block loop (the ops/idgroup.py design): per window the
only HBM traffic is the compacted [N, S] haplotype block in and four
scalars out.

Semantics are identical to the XLA path (asserted in interpret mode and
on-chip by tests/test_ehh.py): per 16-site block, bit-weighted XOR Grams
whose f32 exponent fields read back the first (right, descending
weights) / last (left, ascending weights) disagreeing compacted site;
steps clamp to the active count; pair sums run over upper-triangular
carrier pairs for each allele.

Mosaic rules honoured (doc/architecture.md): 2-D everything, keepdims,
no transposes (column-orientation vectors via exact identity dots), f32
compares, power-of-two weights built from exponent bit patterns.

Reference capability: wip/ehhgfa.py:47-69 (EHH decay area under the
curve), batched into the fused scan (`scan --ehh`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ehh_area_pallas"]

_KB = 16


def _make_kernel(n_cap: int, s_cap: int, a_count: int):
    n_blocks = s_cap // _KB

    def kernel(x_ref, carr_ref, fi_ref, na_ref, sum_ref, steps_acc):
        x_all = x_ref[:]                                    # [N, S] f32
        fi = fi_ref[0, 0]                                   # f32 rank
        n_act = na_ref[0, 0]
        iota_s = jax.lax.broadcasted_iota(
            jnp.int32, (1, s_cap), 1).astype(jnp.float32)
        # Up to 8 blocks share ONE stacked dot: each block's 16 bit
        # weights land in their own 32-BINADE slot anchored at 2^-126
        # (32·7 + 16 = 240 of f32's 253 normal binades), so the group's
        # whole XOR sum is a single [N, 2·16·G] contraction whose f32
        # EXPONENT decodes (block, bit) with pure shift/mask arithmetic.
        # Dominance: lower-slot junk sums to < 2^-16 of the top block's
        # minimum contribution, far outside round-to-nearest reach; all
        # weights are powers of two (exact under the MXU's single-pass
        # bf16 product), products are integers × 2^k (exact in f32), and
        # only the leading binade is read.  Evolution measured at
        # [512, 128] × 320 on v5e (bench ehh_fused): per-block dots +
        # select/min 809 units/s → 16-binade max-slot combine 852 →
        # 7-block group dot 929 → this 8-block shift-decode form.
        _G = 8

        def deaths(dir_mask, pick_first):
            x = x_all * dir_mask
            c = (1.0 - x_all) * dir_mask
            best = None
            for g0 in range(0, n_blocks, _G):
                gsz = min(_G, n_blocks - g0)
                lo = g0 * _KB
                span = gsz * _KB
                # the whole group's weight row in one iota pass: site j
                # (slice-local) is bit (j & 15) of block (j >> 4); block
                # slots descend (first block wins the exponent) for the
                # right scan, ascend (last wins) for the left — so the
                # operands are two ALIGNED slice multiplications instead
                # of 2·gsz narrow lane-concat pieces (the narrow concats
                # were a measurable share of the kernel)
                it = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
                b_vec = jax.lax.shift_right_logical(it, 4)
                k_vec = jnp.bitwise_and(it, _KB - 1)
                slot_vec = ((gsz - 1) - b_vec) if pick_first else b_vec
                bitexp = ((_KB - 1) - k_vec) if pick_first else k_vec
                wfull = jax.lax.bitcast_convert_type(
                    (1 + 32 * slot_vec + bitexp) << 23, jnp.float32)
                xs = x[:, lo:lo + span]
                cs = c[:, lo:lo + span]
                # operands are 0/1 and powers of two — exact in bf16; the
                # explicit cast guarantees the single-pass dot
                d_sum = jax.lax.dot_general(
                    jnp.concatenate(
                        [(xs * wfull).astype(jnp.bfloat16),
                         (cs * wfull).astype(jnp.bfloat16)], axis=1),
                    jnp.concatenate(
                        [cs.astype(jnp.bfloat16),
                         xs.astype(jnp.bfloat16)], axis=1),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # biased exponent 1 + 32·slot + e  (e in [0, 15])
                eb = jax.lax.shift_right_logical(
                    jax.lax.bitcast_convert_type(d_sum, jnp.int32), 23) - 1
                slot_dec = jax.lax.shift_right_logical(eb, 5)
                e_bit = jnp.bitwise_and(eb, 31).astype(jnp.float32)
                if pick_first:
                    b_loc = (gsz - 1) - slot_dec
                    pos = ((g0 + b_loc).astype(jnp.float32) * _KB
                           + (_KB - 1) - e_bit)
                    cand = jnp.where(d_sum > 0, pos, float(s_cap))
                    best = cand if best is None else jnp.minimum(best, cand)
                else:
                    pos = ((g0 + slot_dec).astype(jnp.float32) * _KB
                           + e_bit)
                    cand = jnp.where(d_sum > 0, pos, -1.0)
                    best = cand if best is None else jnp.maximum(best, cand)
            return best

        right_mask = jnp.where((iota_s > fi) & (iota_s < n_act), 1.0, 0.0)
        left_mask = jnp.where(iota_s < fi, 1.0, 0.0)
        death_r = deaths(right_mask, True)
        death_l = deaths(left_mask, False)
        steps = (jnp.maximum(jnp.minimum(death_r, n_act) - fi - 1.0, 0.0)
                 + jnp.maximum(fi - 1.0 - death_l, 0.0))

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cap, n_cap), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cap, n_cap), 1)
        upper = jnp.where(row_ids < col_ids, 1.0, 0.0)
        steps_acc[:] = steps * upper
        # per-allele pair sums as a bilinear form ca·SU·caᵀ: one [A, N]
        # dot + a rowsum instead of per-allele [N, N] elementwise chains
        # and a column-orientation eye dot.  Exactness: step values are
        # integers ≤ S — bf16-exact for S ≤ 256; above, split into
        # multiples of 256 + remainder (both bf16-exact) and run two
        # single-pass dots (the ops/windowstat.py stage-4 trick).
        ca = carr_ref[:]                                    # [A, N]
        if s_cap <= 256:
            t_mid = jax.lax.dot_general(
                ca, steps_acc[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [A, N]
        else:
            su = steps_acc[:]
            s_hi = jnp.floor(su * (1.0 / 256.0)) * 256.0
            t_mid = (jax.lax.dot_general(
                         ca, s_hi, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                         ca, su - s_hi, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32))
        sums = jnp.sum(t_mid * ca, axis=1, keepdims=True)   # [A, 1]
        for a in range(a_count):
            sum_ref[0, a] = sums[a, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("a_count",))
def ehh_area_pallas(xc, carriers, fi_rank, n_act, a_count: int = 2):
    """Per-allele Σ_pairs step counts over carrier pairs — one window.

    Args:
      xc:       [N, S] f32 rank-COMPACTED binarised haplotypes
                (N % 128 == 0, S % 128 == 0)
      carriers: [A, N] f32 carrier masks per allele
      fi_rank:  scalar f32 focal index in rank units
      n_act:    scalar f32 active-site count
    Returns [A] f32 raw step sums (divide by C(n_c, 2) outside).
    """
    n_cap, s_cap = xc.shape
    assert n_cap % 128 == 0 and s_cap % _KB == 0
    fi = jnp.asarray(fi_rank, jnp.float32).reshape(1, 1)
    na = jnp.asarray(n_act, jnp.float32).reshape(1, 1)
    sm = pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        _make_kernel(n_cap, s_cap, a_count),
        in_specs=[
            pl.BlockSpec((n_cap, s_cap), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_count, n_cap), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            sm, sm,
        ],
        out_specs=pl.BlockSpec((1, a_count), lambda: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, a_count), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_cap, n_cap), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * n_cap * n_cap * s_cap,
            bytes_accessed=4 * n_cap * s_cap,
            transcendentals=0,
        ),
    )(xc, carriers, fi, na)
    return out[0]
