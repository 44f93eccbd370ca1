"""Shared test helpers: random similarity fixtures and dict<->tile bridges."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from impop_tpu.io.simtsv import SimilarityMatrix, round_half_even
from impop_tpu.stats.types import SimTile, pad_tile

Pair = Tuple[str, str]


def random_sim_case(
    rng: np.random.Generator,
    n: int,
    missing_frac: float = 0.0,
    round_digits: Optional[int] = None,
    low: float = 0.990,
    high: float = 1.0,
) -> Tuple[Dict[Pair, float], SimilarityMatrix]:
    """Generate a random similarity dict + its dense matrix form.

    Identities drawn uniformly in [low, high] (the realistic impg range);
    a fraction of pairs is dropped to exercise missing-pair semantics.
    """
    names = [f"HG{i:05d}#1#chr" for i in range(n)]
    sim_dict: Dict[Pair, float] = {}
    mat = np.zeros((n, n), dtype=np.float64)
    present = np.zeros((n, n), dtype=bool)
    np.fill_diagonal(mat, 1.0)
    np.fill_diagonal(present, True)
    for i in range(n):
        for j in range(i + 1, n):
            if missing_frac and rng.random() < missing_frac:
                continue
            val = float(rng.uniform(low, high))
            if round_digits is not None:
                val = round(val, round_digits)
            sim_dict[(names[i], names[j])] = val
            mat[i, j] = mat[j, i] = val
            present[i, j] = present[j, i] = True
    if round_digits is not None:
        mat = round_half_even(mat, round_digits)
    sm = SimilarityMatrix(names=names, sim=mat, present=present,
                          pair_count=len(sim_dict))
    return sim_dict, sm


def tile_of(sm: SimilarityMatrix, capacity: Optional[int] = None) -> SimTile:
    cap = capacity or sm.n
    return pad_tile(sm.sim.astype(np.float32), sm.present, cap)


def mask_of(sm: SimilarityMatrix, names, capacity: Optional[int] = None) -> np.ndarray:
    cap = capacity or sm.n
    mask = np.zeros(cap, dtype=bool)
    idx = sm.index()
    for name in names:
        if name in idx:
            mask[idx[name]] = True
    return mask
