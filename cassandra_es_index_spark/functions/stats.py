"""Statistical helpers (r12): the t-distribution p-value companion to
the ``t_test`` aggregation. The aggregation itself emits the
t-statistic and degrees of freedom (pure aggregate Column math —
map-side combinable, SQL-oracle-checkable); converting to ES's p-value
needs the regularized incomplete beta function, which is not
expressible as Column algebra — so it ships here as a vectorized
pandas UDF for client-side (or post-agg) application over the
bucket-count-sized result frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_ITER = 200
_EPS = 1e-14


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method —
    Numerical Recipes 6.4, public-domain algorithm)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def _betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) — symmetric continued
    fraction split at the convergence boundary."""
    import math
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided Student-t survival value: P(|T_df| >= |t|) =
    I_{df/(df+t²)}(df/2, 1/2) — the p-value ES's t_test reports."""
    if not np.isfinite(df) or df <= 0 or np.isnan(t):
        return float("nan")
    if np.isinf(t):
        # the distribution limit, not a guard: P(|T_df| >= ∞) = 0
        # (an infinite statistic arises from a zero-variance split in
        # change_point — infinite evidence, zero p)
        return 0.0
    x = df / (df + t * t)
    return _betainc_reg(df / 2.0, 0.5, x)


@F.pandas_udf(T.DoubleType())
def t_p_value(t: pd.Series, df: pd.Series) -> pd.Series:
    """Vectorized two-sided p-value from (t, df) columns — apply over a
    t_test aggregation's result frame:
    ``out.withColumn("p", t_p_value("tt_t", "tt_df"))``."""
    return pd.Series([t_sf_two_sided(float(tv), float(dv))
                      if tv is not None and dv is not None
                      else None
                      for tv, dv in zip(t, df)], dtype="float64")


def with_p_value(df_out, t_col: str, df_col: str,
                 out_col: str = "p_value"):
    """Convenience: append the two-sided p-value column to a t_test
    result frame (bucket-count-sized — the UDF cost is per bucket,
    never per corpus row)."""
    return df_out.withColumn(out_col,
                             t_p_value(F.col(t_col), F.col(df_col)))


__all__ = ["t_p_value", "t_sf_two_sided", "with_p_value"]
