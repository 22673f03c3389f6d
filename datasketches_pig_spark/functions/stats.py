"""Statistics helpers — Welch's t-test p-value (the analog of
``tuple/ArrayOfDoublesSketchesToPValueEstimates.java:41-80``, which uses
commons-math3 TTest) implemented with a hand-rolled regularized incomplete
beta (no scipy in this environment).
"""

from __future__ import annotations

import math

import numpy as np


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided p-value for Student's t: P(|T| ≥ |t|) = I_{df/(df+t²)}(df/2, ½)."""
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    return betainc_reg(df / 2.0, 0.5, x)


def welch_t_test(
    mean1: float, var1: float, n1: float, mean2: float, var2: float, n2: float
) -> float:
    """Welch's unequal-variance t-test two-sided p-value.

    Requires n ≥ 2 on both sides (the reference guards the same way,
    ``ArrayOfDoublesSketchesToPValueEstimates.java:63-66``).
    """
    if n1 < 2 or n2 < 2:
        return float("nan")
    se2 = var1 / n1 + var2 / n2
    if se2 <= 0:
        return 1.0
    t = (mean1 - mean2) / math.sqrt(se2)
    df = se2**2 / (
        (var1 / n1) ** 2 / (n1 - 1) + (var2 / n2) ** 2 / (n2 - 1)
    )
    return t_sf_two_sided(t, df)


def welch_t_test_arrays(x: np.ndarray, y: np.ndarray) -> float:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x) < 2 or len(y) < 2:
        return float("nan")
    return welch_t_test(
        x.mean(), x.var(ddof=1), len(x), y.mean(), y.var(ddof=1), len(y)
    )
