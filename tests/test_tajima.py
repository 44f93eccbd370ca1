"""Tajima's D vs the reference formulas (tj_d.py:41-65)."""
import numpy as np
import pytest

import oracle

from impop_tpu.stats.api import tajimas_d_jit
from impop_tpu.stats.tajima import tajima_constants


def test_worked_example():
    """doc/how_tjd.md:45: tj_d.py -n 446 -p 0.59146123 -S 20."""
    want = oracle.tajimas_d(446, 20.0, 0.59146123)
    got = float(tajimas_d_jit(446.0, 20.0, 0.59146123))
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("n", [2, 3, 5, 10, 17, 50, 200, 446, 930])
def test_constants_match(n):
    a1 = sum(1.0 / i for i in range(1, n))
    a2 = sum(1.0 / (i * i) for i in range(1, n))
    c = tajima_constants(np.float32(n))
    # f32 budget: H_n ~ 6 with eps 1.2e-7 => ~1e-5 relative is round-off
    np.testing.assert_allclose(float(c.a1), a1, rtol=1e-5)
    np.testing.assert_allclose(float(c.a2), a2, rtol=2e-5)


def test_batched_matches_oracle(rng):
    n = rng.integers(2, 500, size=64)
    s = rng.integers(0, 100, size=64).astype(float)
    # reference feeds pica2's per-site π here (run_tajd.sh:174-180)
    pi = rng.uniform(0, 2.0, size=64)
    got = np.asarray(tajimas_d_jit(n.astype(np.float32), s, pi))
    for i in range(64):
        want = oracle.tajimas_d(int(n[i]), s[i], pi[i])
        if np.isnan(want):
            assert np.isnan(got[i]), i
        else:
            np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=1e-6,
                                       err_msg=str(i))


def test_s_zero_is_nan():
    assert np.isnan(float(tajimas_d_jit(100.0, 0.0, 1.0)))
