"""On-chip differential + timing for ops/windowstat.py (full fusion).

Compares the single-kernel whole-window program against the round-4 path
(idgroup kernel + XLA tail) on the bench's HPRC-shaped batch, then times
both at the headline shape with the CLAUDE.md protocol (device-resident
inputs, >=16 back-to-back calls, real fetch barrier).
"""
from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench as B
    from impop_tpu.stats.panelstats import fused_window_stats
    from impop_tpu.stats.tajima import tajimas_d

    rng = np.random.default_rng(42)
    geno, member, smask, panels, lengths = B.synth_batch(rng)
    w = geno.shape[0]
    pair_a = jnp.asarray(
        [list(B.PANEL_SIZES).index(a) for a, _ in B.PAIRS], jnp.int32)
    pair_b = jnp.asarray(
        [list(B.PANEL_SIZES).index(b) for _, b in B.PAIRS], jnp.int32)
    t = jnp.float32(B.THRESHOLD)

    def mk(return_matrices):
        def one_window(g, m, sm, p1, ln):
            _s, _p, s_countf, res = fused_window_stats(
                g, m, sm, ln, p1, pair_a, pair_b, t,
                pairs_disjoint=True, return_matrices=return_matrices)
            p_count = p1.shape[0]
            pi_panel = res.pi[:p_count]
            d = tajimas_d(res.n[:p_count], s_countf, pi_panel / ln)
            return jnp.concatenate([
                res.pi, d, res.hudson.fst, res.hudson_grouped.fst,
                res.n, res.num_groups.astype(jnp.float32),
                res.pairs_used.astype(jnp.float32),
                s_countf.reshape(1),
                res.seed_risk.reshape(1).astype(jnp.float32),
            ])
        return jax.jit(jax.vmap(one_window))

    batch = tuple(jax.device_put(jnp.asarray(a))
                  for a in (geno, member, smask, panels, lengths))

    step_old = mk(True)
    step_new = mk(False)

    print("compiling old path...", flush=True)
    t0 = time.perf_counter()
    out_old = np.asarray(step_old(*batch))
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
    print("compiling NEW full-fusion path...", flush=True)
    t0 = time.perf_counter()
    out_new = np.asarray(step_new(*batch))
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)

    bad = ~np.isclose(out_old, out_new, rtol=1e-5, atol=1e-7, equal_nan=True)
    print(f"differential: {bad.sum()} / {out_old.size} mismatches "
          f"(max abs {np.max(np.abs(np.nan_to_num(out_old - out_new))):.3e})",
          flush=True)
    if bad.sum():
        ww, cc = np.nonzero(bad)
        for i in range(min(10, len(ww))):
            print(f"  w={ww[i]} col={cc[i]} old={out_old[ww[i], cc[i]]} "
                  f"new={out_new[ww[i], cc[i]]}")

    for tag, step in (("old (idgroup+tail)", step_old),
                      ("NEW (full fusion)", step_new)):
        out = step(*batch)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _i in range(16):
            out = step(*batch)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        us = dt / (16 * w) * 1e6
        print(f"{tag:22s} {us:8.2f} us/window ({w * 16 / dt:9.0f} win/s, "
              f"{w * 16 / dt / 40:7.1f} units/s)", flush=True)


if __name__ == "__main__":
    main()
