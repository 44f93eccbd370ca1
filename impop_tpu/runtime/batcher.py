"""Host-side window batching: ragged windows → padded device batches.

Each window carries its own haplotype roster (impg emits whatever projects
into the region), so the batcher assigns rows per window in sorted-name order
(the deterministic grouping spec), pads to the configured capacity, and
builds [W, P, N] panel masks by prefix expansion (h-fst.py:64-82 semantics).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from impop_tpu.io.panels import expand_population
from impop_tpu.io.simtsv import SimilarityMatrix
from impop_tpu.parallel.scan import WindowBatch

__all__ = ["PanelSet", "build_window_batch", "pad_batch_count"]


@dataclasses.dataclass(frozen=True)
class PanelSet:
    """Named population panels (raw assembly identifiers, pre-expansion)."""

    names: Tuple[str, ...]
    members: Tuple[Tuple[str, ...], ...]

    @classmethod
    def from_dict(cls, panels: Dict[str, Sequence[str]]) -> "PanelSet":
        names = tuple(panels.keys())
        return cls(names, tuple(tuple(panels[k]) for k in names))

    @property
    def count(self) -> int:
        return len(self.names)

    def index(self, name: str) -> int:
        return self.names.index(name)


def pad_batch_count(w: int, multiple: int) -> int:
    return ((w + multiple - 1) // multiple) * multiple


def build_window_batch(
    mats: Sequence[SimilarityMatrix],
    panels: Optional[PanelSet],
    capacity: int,
    batch_pad: int = 1,
    exact_names: bool = False,
) -> Tuple[WindowBatch, List[List[str]]]:
    """Stack per-window SimilarityMatrix objects into a WindowBatch.

    Args:
      mats: one parsed similarity matrix per window (already rounded)
      panels: population panels; None → a single all-members panel
      capacity: static N; windows larger than this raise
      batch_pad: pad the window count up to a multiple (empty windows are
        all-False members — harmless under masking, keeps one compiled shape
        per (W, N) and divisibility for mesh sharding)
      exact_names: panels list concrete sequence names (fixture style) rather
        than assembly identifiers needing prefix expansion

    Returns (batch, per-window row-name lists).
    """
    w_real = len(mats)
    w = pad_batch_count(max(w_real, 1), batch_pad)
    p = panels.count if panels is not None else 1

    sim = np.zeros((w, capacity, capacity), dtype=np.float32)
    present = np.zeros((w, capacity, capacity), dtype=bool)
    member = np.zeros((w, capacity), dtype=bool)
    panel_masks = np.zeros((w, p, capacity), dtype=bool)
    names_per_window: List[List[str]] = []

    for wi, mat in enumerate(mats):
        n = mat.n
        if n > capacity:
            raise ValueError(
                f"window {wi} has {n} haplotypes > capacity {capacity}"
            )
        sim[wi, :n, :n] = mat.sim
        present[wi, :n, :n] = mat.present
        member[wi, :n] = True
        names_per_window.append(list(mat.names))
        idx = mat.index()
        if panels is None:
            panel_masks[wi, 0, :n] = True
        else:
            for pi, plist in enumerate(panels.members):
                if exact_names:
                    matched = [s for s in plist if s in idx]
                else:
                    matched, _ = expand_population(plist, mat.names)
                for s in matched:
                    panel_masks[wi, pi, idx[s]] = True

    return (
        WindowBatch(
            sim=jnp.asarray(sim),
            present=jnp.asarray(present),
            member=jnp.asarray(member),
            panels=jnp.asarray(panel_masks),
        ),
        names_per_window,
    )
