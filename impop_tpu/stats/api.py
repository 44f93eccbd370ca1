"""Jitted single-window entry points.

The core estimators in stats/ are pure traced functions; these wrappers jit
them once per tile shape (thresholds are passed as arrays so distinct values
do not trigger recompilation).  The scan runtime uses its own batched/vmapped
compilation; these are for one-off CLI calls and tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from impop_tpu.stats.diversity import direct_diversity
from impop_tpu.stats.fst import fst_3pi, hudson_fst_direct, hudson_fst_grouped
from impop_tpu.stats.pi import grouped_diversity, pi_grouped
from impop_tpu.stats.tajima import tajimas_d

__all__ = [
    "pi_grouped_jit",
    "grouped_diversity_jit",
    "direct_diversity_jit",
    "hudson_fst_direct_jit",
    "hudson_fst_grouped_jit",
    "tajimas_d_jit",
    "fst_3pi_jit",
]


def _as_f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


@jax.jit
def pi_grouped_jit(sim, present, member, threshold):
    return pi_grouped(sim, present, member, _as_f32(threshold))


@jax.jit
def grouped_diversity_jit(sim, present, member, threshold):
    return grouped_diversity(sim, present, member, _as_f32(threshold))


@jax.jit
def direct_diversity_within_jit(sim, present, mask_a):
    return direct_diversity(sim, present, mask_a)


@jax.jit
def direct_diversity_between_jit(sim, present, mask_a, mask_b):
    return direct_diversity(sim, present, mask_a, mask_b)


def direct_diversity_jit(sim, present, mask_a, mask_b=None):
    if mask_b is None:
        return direct_diversity_within_jit(sim, present, mask_a)
    return direct_diversity_between_jit(sim, present, mask_a, mask_b)


@jax.jit
def hudson_fst_direct_jit(sim, present, mask_a, mask_b):
    return hudson_fst_direct(sim, present, mask_a, mask_b)


@jax.jit
def hudson_fst_grouped_jit(sim, present, mask_a, mask_b, threshold):
    return hudson_fst_grouped(sim, present, mask_a, mask_b, _as_f32(threshold))


@jax.jit
def tajimas_d_jit(n, s, pi):
    return tajimas_d(n, s, pi)


@jax.jit
def fst_3pi_jit(pi_a, pi_b, pi_c):
    return fst_3pi(_as_f32(pi_a), _as_f32(pi_b), _as_f32(pi_c))
