"""Roofline decomposition of the fused panel step (bench.py regime 1).

Times nested prefixes of the per-window program on the real chip —
identity+S, +grouping, +fused panel stats, full step — so the headline's
23-24 µs/window budget can be attributed to stages, and compares the
implied HBM traffic against the chip's bandwidth (doc/architecture.md
"Device headline roofline").

Protocol per CLAUDE.md: device-resident inputs, >=16 back-to-back calls,
one real device-to-host fetch as the barrier, nothing else running.
"""
from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(_HERE)))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(_HERE))
    import bench as B
    from impop_tpu.stats.allele import identity_from_alleles, segregating_sites
    from impop_tpu.stats.grouping import greedy_group_panels
    from impop_tpu.stats.panelstats import fused_panel_stats

    rng = np.random.default_rng(42)
    geno, member, smask, panels, lengths = B.synth_batch(rng)
    w = geno.shape[0]
    pair_a = jnp.asarray(
        [list(B.PANEL_SIZES).index(a) for a, _ in B.PAIRS], jnp.int32)
    pair_b = jnp.asarray(
        [list(B.PANEL_SIZES).index(b) for _, b in B.PAIRS], jnp.int32)
    t = jnp.float32(B.THRESHOLD)

    g_d = jax.device_put(jnp.asarray(geno))
    m_d = jax.device_put(jnp.asarray(member))
    sm_d = jax.device_put(jnp.asarray(smask))
    p_d = jax.device_put(jnp.asarray(panels))
    l_d = jax.device_put(jnp.asarray(lengths))

    def timeit(tag, fn, iters=16):
        step = jax.jit(jax.vmap(fn))
        out = step(g_d, m_d, sm_d, p_d, l_d)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _i in range(iters):
            out = step(g_d, m_d, sm_d, p_d, l_d)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        us = dt / (iters * w) * 1e6
        print(f"{tag:28s} {us:8.2f} us/window "
              f"({w * iters / dt:9.0f} win/s)", flush=True)
        return us

    def f_ident(g, m, sm, p1, ln):
        sim, present = identity_from_alleles(g, m, sm, ln)
        return jnp.sum(sim) + segregating_sites(g, m, sm)

    def f_seedpeel(g, m, sm, p1, ln):
        from impop_tpu.ops.seedpeel import seed_peel_pallas

        sim, present = identity_from_alleles(g, m, sm, ln)
        unions = p1[pair_a] | p1[pair_b]
        all_masks = jnp.concatenate([p1, unions], axis=0)
        seed = seed_peel_pallas(sim, present, m, all_masks, t)
        return jnp.sum(sim) + jnp.sum(seed) + segregating_sites(g, m, sm)

    def f_group(g, m, sm, p1, ln):
        sim, present = identity_from_alleles(g, m, sm, ln)
        unions = p1[pair_a] | p1[pair_b]
        all_masks = jnp.concatenate([p1, unions], axis=0)
        gid = greedy_group_panels(sim, present, m, all_masks, t)
        return jnp.sum(sim) + jnp.sum(gid) + segregating_sites(g, m, sm)

    def f_fused(g, m, sm, p1, ln):
        sim, present = identity_from_alleles(g, m, sm, ln)
        res = fused_panel_stats(sim, present, m, p1, pair_a, pair_b, t,
                                pairs_disjoint=True)
        return (jnp.sum(res.pi) + jnp.sum(res.hudson.fst)
                + jnp.sum(res.hudson_grouped.fst)
                + segregating_sites(g, m, sm))

    def f_idgroup(g, m, sm, p1, ln):
        from impop_tpu.ops.idgroup import identity_group_pallas
        from impop_tpu.stats.panelstats import panel_mask_stack

        am, _, _ = panel_mask_stack(p1, m, pair_a, pair_b, True)
        sim, pres, gid, s = identity_group_pallas(g, m, sm, am, t, ln)
        return jnp.sum(sim) + jnp.sum(gid) + s

    def f_window(g, m, sm, p1, ln):
        from impop_tpu.stats.panelstats import fused_window_stats

        _sim, _pres, s, res = fused_window_stats(
            g, m, sm, ln, p1, pair_a, pair_b, t, pairs_disjoint=True)
        return (jnp.sum(res.pi) + jnp.sum(res.hudson.fst)
                + jnp.sum(res.hudson_grouped.fst) + s)

    step_full = B.device_pipeline()

    if "--idgroup-stages" in sys.argv:
        # Internal budget of the fused idgroup kernel via its `stages`
        # bisection knob (ops/idgroup.py): 1 = identity+S, 2 = +seed peel,
        # 3 = +gid argmin.  Stage deltas attribute the kernel's own
        # per-window µs; the kernel's outputs are fetched through the same
        # barrier protocol.
        from impop_tpu.ops.idgroup import identity_group_pallas
        from impop_tpu.stats.panelstats import panel_mask_stack

        def make_stage(stg):
            def f(g, m, sm, p1, ln):
                am, _, _ = panel_mask_stack(p1, m, pair_a, pair_b, True)
                sim, pres, gid, s = identity_group_pallas(
                    g, m, sm, am, t, ln, stages=stg)
                return jnp.sum(sim) + jnp.sum(gid) + s
            return f

        us_by_stage = {}
        for stg, tag in ((1, "idgroup stages=1 (ident+S)"),
                         (2, "idgroup stages=2 (+peel)"),
                         (3, "idgroup stages=3 (+gid)")):
            us_by_stage[stg] = timeit(tag, make_stage(stg))
        print(f"\nstage deltas: peel={us_by_stage[2] - us_by_stage[1]:.2f} "
              f"gid={us_by_stage[3] - us_by_stage[2]:.2f} us/window",
              flush=True)
        return

    us_i = timeit("identity+S (composed)", f_ident)
    us_sp = timeit("identity+S+seedpeel", f_seedpeel)
    us_g = timeit("identity+S+grouping", f_group)
    us_f = timeit("identity+S+fused_stats", f_fused)
    us_k = timeit("idgroup kernel (fused)", f_idgroup)
    us_w = timeit("fused_window_stats", f_window)

    # full pipeline via bench.py's own step (adds tajd, f3, packing)
    batch = tuple(jax.device_put(a) for a in
                  (geno, member, smask, panels, lengths))
    out = step_full(*batch)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _i in range(16):
        out = step_full(*batch)
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    us_full = dt / (16 * w) * 1e6
    print(f"{'full device step':28s} {us_full:8.2f} us/window "
          f"({w * 16 / dt:9.0f} win/s)", flush=True)

    # HBM traffic model of the [N, N] working set per window (f32 sim,
    # int8 present; S=128 operands are noise).  This table models the
    # COMPOSED pipeline; the fused idgroup path eliminates the
    # seedpeel/elink/gid crossings entirely (its [N, N] traffic is the
    # one sim+pres write plus panelquad's read + seed_risk ≈ 2.9 MB).
    n = 512
    nn = n * n
    traffic = {
        "identity: write sim+pres": nn * 5,
        "seedpeel: read sim+pres": nn * 5,
        "elink: read sim, write bf16": nn * 6,
        "gid argmin: read elink": nn * 2,
        "panelquad: read sim+pres": nn * 5,
        "seed_risk: read pres": nn * 1,
    }
    total = sum(traffic.values())
    bw = float(os.environ.get("IMPOP_BENCH_HBM_GBS", 820.0))
    floor_us = total / (bw * 1e3)
    print(f"\n[N,N] traffic model: {total / 1e6:.1f} MB/window -> "
          f"{floor_us:.2f} us at {bw:.0f} GB/s", flush=True)
    print(f"measured full step:  {us_full:.2f} us/window "
          f"({100 * floor_us / us_full:.0f}% of bandwidth bound)",
          flush=True)
    for k, v in traffic.items():
        print(f"  {k:28s} {v / 1e6:5.2f} MB")


if __name__ == "__main__":
    main()
