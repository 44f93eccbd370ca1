"""Tajima's D (Tajima 1989).

Same formulas as the reference's tj_d.py:41-65:
    a1 = Σ_{i=1}^{n-1} 1/i          a2 = Σ_{i=1}^{n-1} 1/i²
    b1 = (n+1)/(3(n-1))             b2 = 2(n²+n+3)/(9n(n-1))
    c1 = b1 - 1/a1                  c2 = b2 - (n+2)/(a1·n) + a2/a1²
    e1 = c1/a1                      e2 = c2/(a1² + a2)
    D  = (π - S/a1) / sqrt(e1·S + e2·S(S-1)),  NaN when S == 0.

Here n, S, π are vectors over a window batch: the harmonic sums become
digamma/trigamma closed forms so the whole thing is one fused elementwise
kernel, vectorised over every window and panel at once (the reference runs
one Python process per window, run_tajd.sh:180).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
__all__ = ["TajimaConstants", "tajima_constants", "tajimas_d"]

_EULER_GAMMA = 0.5772156649015328606


class TajimaConstants(NamedTuple):
    a1: jnp.ndarray
    a2: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray


_K0 = 32


def _harmonic(m: jnp.ndarray) -> jnp.ndarray:
    """H_m = Σ_{i=1}^{m} 1/i.

    Exact partial sums for m <= 32 (table lookup); the asymptotic expansion
    H_m = ln m + γ + 1/(2m) - 1/(12m²) + 1/(120m⁴) for the tail — backend
    independent and accurate to f32 round-off, unlike digamma whose
    implementation differs across XLA backends.
    """
    dtype = jnp.result_type(m, jnp.float32)
    i = jnp.arange(1, _K0 + 1, dtype=dtype)
    table = jnp.cumsum(1.0 / i)  # table[k-1] = H_k
    m_arr = jnp.asarray(m)
    small = jnp.clip(m_arr.astype(jnp.int32), 0, _K0)
    direct = jnp.where(small > 0, table[jnp.maximum(small - 1, 0)], 0.0)

    x = jnp.maximum(m_arr.astype(dtype), float(_K0 + 1))
    inv = 1.0 / x
    inv2 = inv * inv
    tail = (
        jnp.log(x)
        + _EULER_GAMMA
        + inv * (0.5 - inv * (1.0 / 12.0 - inv2 / 120.0))
    )
    return jnp.where(m_arr <= _K0, direct, tail)


def _harmonic2(m: jnp.ndarray) -> jnp.ndarray:
    """Σ_{i=1}^{m} 1/i² = π²/6 - ψ'(m+1), via the trigamma asymptotic series.

    jax.scipy lacks polygamma on all backends; the 6-term asymptotic
    expansion of ψ'(x) is accurate to <1e-10 for x >= 10, so we sum the
    first 16 terms directly and use the series only for the tail.
    """
    pi2_6 = jnp.asarray(1.6449340668482264, dtype=jnp.result_type(m, jnp.float32))

    # direct partial sum for the first k0 terms, series for the rest
    k0 = _K0
    i = jnp.arange(1, k0 + 1, dtype=pi2_6.dtype)
    direct_full = jnp.cumsum(1.0 / (i * i))  # direct_full[k-1] = Σ_{1..k}
    m_i = jnp.asarray(m)
    small = jnp.clip(m_i.astype(jnp.int32), 0, k0)
    direct = jnp.where(
        small > 0, direct_full[jnp.maximum(small - 1, 0)], 0.0
    )

    # trigamma(x) ≈ 1/x + 1/(2x²) + 1/(6x³) - 1/(30x⁵) + 1/(42x⁷)
    x = jnp.maximum(m_i.astype(pi2_6.dtype) + 1.0, k0 + 1.0)
    inv = 1.0 / x
    inv2 = inv * inv
    trig = inv * (1.0 + inv * (0.5 + inv * (1.0 / 6.0 - inv2 * (1.0 / 30.0 - inv2 / 42.0))))
    tail = pi2_6 - trig  # Σ_{1..x-1} 1/i² for the continuum
    return jnp.where(m_i <= k0, direct, tail)


def tajima_constants(n: jnp.ndarray) -> TajimaConstants:
    """The n-dependent constants (tj_d.py:53-60), vectorised over n."""
    nf = jnp.asarray(n, dtype=jnp.float32)
    a1 = _harmonic(nf - 1.0)
    a2 = _harmonic2(nf - 1.0)
    b1 = (nf + 1.0) / (3.0 * (nf - 1.0))
    b2 = 2.0 * (nf * nf + nf + 3.0) / (9.0 * nf * (nf - 1.0))
    c1 = b1 - 1.0 / a1
    c2 = b2 - (nf + 2.0) / (a1 * nf) + a2 / (a1 * a1)
    e1 = c1 / a1
    e2 = c2 / (a1 * a1 + a2)
    return TajimaConstants(a1, a2, b1, b2, c1, c2, e1, e2)


def tajimas_d(n: jnp.ndarray, s: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """D = (π - S/a1) / sqrt(e1·S + e2·S(S-1)); NaN when S == 0 or n < 2.

    Matches tj_d.py:62-65 including the NaN contract the drivers map to "NA"
    (run_tajd.sh:192-194).
    """
    nf = jnp.asarray(n, dtype=jnp.float32)
    sf = jnp.asarray(s, dtype=jnp.float32)
    pif = jnp.asarray(pi, dtype=jnp.float32)
    c = tajima_constants(jnp.maximum(nf, 2.0))
    numerator = pif - sf / c.a1
    var = c.e1 * sf + c.e2 * sf * (sf - 1.0)
    denominator = jnp.sqrt(jnp.maximum(var, 0.0))
    ok = (sf > 0) & (denominator > 0) & (nf >= 2)
    return jnp.where(ok, numerator / jnp.where(ok, denominator, 1.0), jnp.nan)
