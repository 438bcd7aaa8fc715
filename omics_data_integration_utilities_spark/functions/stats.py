"""Numpy-native statistical special functions.

The engine's only non-SQL statistic is the Student-t tail for correlation
p-values (SURVEY K6, reference uses ``scipy.stats.pearsonr``).  The
runtime image has numpy but not scipy, so the regularized incomplete beta
is implemented here directly (Lentz's continued fraction, the standard
betacf construction) — vectorized, float64, agrees with scipy to ~1e-12.
"""

from __future__ import annotations

import math

import numpy as np

_LGAMMA = np.frompyfunc(math.lgamma, 1, 1)


def _betacf(a: np.ndarray, b: np.ndarray, x: np.ndarray, max_iter: int = 300) -> np.ndarray:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    tiny = 1e-300
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < tiny, tiny, d)
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < 3e-14):
            break
    return h


def betainc(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    x = np.asarray(x, dtype=float)
    a, b, x = np.broadcast_arrays(a, b, x)
    scalar = x.ndim == 0
    a, b, x = np.atleast_1d(a, b, x)
    ln_beta = np.asarray(_LGAMMA(a + b) - _LGAMMA(a) - _LGAMMA(b), dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        front = np.exp(ln_beta + a * np.log(x) + b * np.log1p(-x))
    # continued fraction converges fast for x < (a+1)/(a+b+2); use the
    # symmetry I_x(a,b) = 1 − I_{1−x}(b,a) otherwise.  The x∈{0,1}
    # boundaries make log/log1p emit ±inf (front factor 0 by intent —
    # the final np.where pins those outputs), so both front
    # computations sit under the same errstate guard
    direct = x < (a + 1.0) / (a + b + 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        res_direct = front * _betacf(a, b, np.where(direct, x, 0.5)) / a
        front_sym = np.exp(ln_beta + a * np.log(x) + b * np.log1p(-x))
        res_sym = 1.0 - front_sym * _betacf(b, a, np.where(direct, 0.5, 1.0 - x)) / b
    out = np.where(direct, res_direct, res_sym)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return out[0] if scalar else out


def student_t_sf_two_sided(t, df):
    """Two-sided tail P(|T| >= |t|) for Student-t with ``df`` degrees of
    freedom: I_{df/(df+t²)}(df/2, 1/2)."""
    t = np.asarray(t, dtype=float)
    df = np.asarray(df, dtype=float)
    x = df / (df + t * t)
    return betainc(df / 2.0, 0.5, x)
