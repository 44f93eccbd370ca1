"""A/B benchmark of the pairwise-identity formulations on the real chip.

Times, at the long-window regime shape ([n, s] = [512, 8192] by default):
  i8-pallas   two int8 MXU Gram matmuls (ops/pairdiff._kernel_i8)
  f32-pallas  three bf16/f32 matmuls with in-kernel prep (weighted kernel,
              unit weights)
  i8-xla      the same z/v math through XLA's int8 dot path
  f32-xla     the original stats/allele formulation

Timing protocol per CLAUDE.md: >=16 back-to-back calls ended with a real
device-to-host fetch; device-resident inputs.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from impop_tpu.ops.pairdiff import (
        _pairwise_identity_pallas_i8,
        pairwise_identity_pallas,
        pairwise_identity_xla,
        pairwise_identity_xla_i8,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    rng = np.random.default_rng(7)
    classes = rng.integers(0, 2, size=(16, s)).astype(np.int8)
    g = classes[rng.integers(0, 16, size=n)]
    g = np.where(rng.random((n, s)) < 0.001, 1 - g, g).astype(np.int8)
    member = np.ones(n, bool)
    smask = np.ones(s, bool)
    length = jnp.float32(500000.0)

    g_d = jax.device_put(jnp.asarray(g))
    m_d = jax.device_put(jnp.asarray(member))
    sm_d = jax.device_put(jnp.asarray(smask))
    ones_w = jnp.ones(s, jnp.float32)

    # reduce outputs on device: through the remote tunnel every dispatched
    # output array ships back (~[N, N] f32 per call would dominate), so the
    # kernels are compared behind a scalar reduction like the long-window
    # regime uses
    def reduced(fn):
        @jax.jit
        def step():
            sim, pres = fn()
            return jnp.sum(sim), jnp.sum(pres)
        return step

    cands = {
        "i8-xla": reduced(lambda: pairwise_identity_xla_i8(
            g_d, m_d, sm_d, length)),
        "f32-pallas": reduced(lambda: pairwise_identity_pallas(
            g_d, m_d, sm_d, length, site_weights=ones_w)),
        "f32-xla": reduced(lambda: pairwise_identity_xla(
            g_d, m_d, sm_d, length)),
    }
    if os.environ.get("IMPOP_AB_I8_PALLAS") == "1":
        # known to wedge the remote Mosaic compile on some backends —
        # opt-in only
        cands["i8-pallas"] = reduced(lambda: _pairwise_identity_pallas_i8(
            g_d, m_d, sm_d, length, 256, 512))
    ref = None
    for name, fn in cands.items():
        try:
            out = fn()
            sim0 = np.asarray(out[0])
            if ref is None:
                ref = sim0
            else:
                np.testing.assert_allclose(sim0, ref, rtol=1e-5)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            _ = np.asarray(out[0])
            dt = (time.perf_counter() - t0) / iters
            gcells = n * n * s / 1e9
            print(f"{name}: {dt*1e3:.2f} ms/window, "
                  f"{gcells/dt:.0f} Gcells/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
