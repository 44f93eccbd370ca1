"""On-chip differential: the fused device pipeline vs the numpy oracle.

Runs the REAL backend (axon TPU by default — the CPU test suite cannot
catch MXU-specific behavior) over HPRC-shaped synthetic windows and
compares every pi / direct-Fst / grouped-Fst / S value against
tests/oracle.py computed in f64 on the same f32 similarity inputs.

This is the check that caught the r4 precision finding: the MXU's
DEFAULT f32 matmul is single-pass bf16, which put ~1e-3 relative error
into the value-carrying quadratic forms until they were pinned to
precision=HIGHEST (doc/architecture.md "Matmul precision").  Run it after
touching any device reduction:

    python tools/check_device_oracle.py
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))
import numpy as np, jax, jax.numpy as jnp
import bench as B
import oracle
from impop_tpu.stats.panelstats import fused_window_stats

rng = np.random.default_rng(99)
geno, member, smask, panels, lengths = B.synth_batch(rng, w=8)
pair_a_l = [list(B.PANEL_SIZES).index(a) for a, _ in B.PAIRS]
pair_b_l = [list(B.PANEL_SIZES).index(b) for _, b in B.PAIRS]
pair_a = jnp.asarray(pair_a_l, jnp.int32); pair_b = jnp.asarray(pair_b_l, jnp.int32)
t = 0.999
panel_names = list(B.PANEL_SIZES)

RETURN_MATRICES = os.environ.get("IMPOP_ORACLE_OLD_PATH") == "1"

@jax.jit
def step(g, m, sm, p1, ln):
    def one(g1, m1, sm1, ps, l1):
        # return_matrices=False exercises the production scan path — the
        # single whole-window Mosaic kernel (ops/windowstat.py)
        _sim, _pres, s_countf, res = fused_window_stats(
            g1, m1, sm1, l1, ps, pair_a, pair_b, jnp.float32(t),
            pairs_disjoint=True, return_matrices=RETURN_MATRICES)
        return res.pi, res.hudson.fst, res.hudson_grouped.fst, s_countf
    return jax.vmap(one)(g, m, sm, p1, ln)

pi_d, fst_d, fstg_d, s_d = (np.asarray(x) for x in step(
    jnp.asarray(geno), jnp.asarray(member), jnp.asarray(smask),
    jnp.asarray(panels), jnp.asarray(lengths)))

max_err = 0.0
for wi in range(8):
    g = geno[wi][member[wi]][:, smask[wi]]
    n = g.shape[0]
    names = [f"h{i:04d}" for i in range(n)]
    L = float(lengths[wi])
    diff = (g[:, None, :] != g[None, :, :]).sum(-1)
    # device computes sims in f32; feed the oracle the same values so the
    # strict-> threshold decisions match (1 - k/L is not exact in binary)
    simm = (np.float32(1.0) - diff.astype(np.float32) / np.float32(L)).astype(np.float32)
    sd = {(names[i], names[j]): float(simm[i, j])
          for i in range(n) for j in range(i + 1, n)}
    s_np = int(((g.max(0) != g.min(0))).sum())
    assert int(s_d[wi]) == s_np, (wi, s_d[wi], s_np)
    for pi_idx, pname in enumerate(panel_names):
        mask = panels[wi, pi_idx][member[wi]]
        sub = [names[i] for i in range(n) if mask[i]]
        pval, _ = oracle.pica2_pi(
            {k: v for k, v in sd.items()
             if k[0] in set(sub) and k[1] in set(sub)}, sub, t)
        e = abs(pval - float(pi_d[wi, pi_idx])) / max(abs(pval), 1e-12)
        max_err = max(max_err, e)
        assert e < 1e-4, (wi, pname, pval, pi_d[wi, pi_idx])
    for qi, (a, b) in enumerate(B.PAIRS):
        ia, ib = panel_names.index(a), panel_names.index(b)
        pa = [names[i] for i in range(n) if panels[wi, ia][member[wi]][i]]
        pb = [names[i] for i in range(n) if panels[wi, ib][member[wi]][i]]
        w_d = oracle.hudson_fst_direct(sd, pa, pb)
        w_g = oracle.hudson_fst_grouped(sd, pa, pb, t)
        ed = abs(w_d["fst"] - float(fst_d[wi, qi]))
        eg = abs(w_g["fst"] - float(fstg_d[wi, qi]))
        max_err = max(max_err, ed, eg)
        assert ed < 2e-3 and eg < 2e-3, (wi, a, b, w_d["fst"], fst_d[wi, qi], w_g["fst"], fstg_d[wi, qi])
print(f"TPU-vs-oracle differential OK over 8 windows x 5 panels x 10 pairs; max err {max_err:.2e}")
