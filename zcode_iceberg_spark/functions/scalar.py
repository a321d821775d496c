"""Scalar expression library (SURVEY.md G-group).

Every function here returns a Catalyst ``Column`` built from pyspark
built-ins only — no Python UDFs — so the whole scoring battery stays
inside whole-stage codegen at any scale. The reference computes these
per tick in Python scalars (strategy.py:139-328, aether_oracle.py:
256-352); here they are columnar expressions over feature frames.

Where a formula has no Spark SQL builtin (the normal CDF Φ — reference
strategy.py:149 uses scipy.stats.norm.cdf), we use the Zelen & Severo
(Abramowitz–Stegun 26.2.17) polynomial approximation expressed in plain
arithmetic+exp, so the identical formula is writable in the DuckDB
oracle SQL and matches bit-for-bit to ~7.5e-8 absolute accuracy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp(col: Column, lo: float, hi: float) -> Column:
    """max(lo, min(hi, x)) — reference strategy.py:150,328 et al."""
    return F.least(F.greatest(col, F.lit(float(lo))), F.lit(float(hi)))


def sigmoid(col: Column) -> Column:
    """1/(1+e^-x) with the reference's overflow clamp at ±500
    (aether_oracle.py:256-261)."""
    x = clamp(col, -500.0, 500.0)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def normal_cdf(col: Column) -> Column:
    """Φ(x) via Abramowitz–Stegun 26.2.17 polynomial (|err| < 7.5e-8).

    Used by the core score transform (reference strategy.py:139-150:
    ``norm.cdf((v - thresh)/(thresh/2))``). Pure arithmetic so it runs
    JVM-side and is reproducible in ANSI SQL for the oracle.
    """
    x = col
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * ax)
    # Horner form of b1*t + b2*t^2 + ... + b5*t^5
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t * (F.lit(1.781477937) + t * (F.lit(-1.821255978) + t * F.lit(1.330274429)))
        )
    )
    pdf = F.lit(0.3989422804014327) * F.exp(F.lit(-0.5) * ax * ax)
    upper = F.lit(1.0) - pdf * poly
    return F.when(x >= 0, upper).otherwise(F.lit(1.0) - upper)


def normal_cdf_sql(x: str) -> str:
    """Render the identical Φ approximation as an inline SQL expression
    (same constants/associativity as :func:`normal_cdf` so DuckDB and
    Spark agree to float precision)."""
    ax = f"abs({x})"
    t = f"(1.0/(1.0 + 0.2316419*{ax}))"
    poly = (
        f"({t}*(0.319381530 + {t}*(-0.356563782 + {t}*(1.781477937 "
        f"+ {t}*(-1.821255978 + {t}*1.330274429)))))"
    )
    upper = f"(1.0 - 0.3989422804014327*exp(-0.5*{ax}*{ax})*{poly})"
    return f"(CASE WHEN ({x}) >= 0 THEN {upper} ELSE 1.0 - {upper} END)"


def weighted_mean_available(pairs: list[tuple[Column, float]]) -> Column:
    """Σwᵢvᵢ/Σwᵢ over the non-null components.

    The reference renormalizes fusion weights by whichever signals are
    present (strategy.py:296-304, aether_oracle.py:446-462).
    """
    num = None
    den = None
    for col, w in pairs:
        contrib = F.when(col.isNotNull(), col * F.lit(float(w))).otherwise(F.lit(0.0))
        wterm = F.when(col.isNotNull(), F.lit(float(w))).otherwise(F.lit(0.0))
        num = contrib if num is None else num + contrib
        den = wterm if den is None else den + wterm
    return F.when(den > 0, num / den)


def kelly_fraction(p: Column, b: float = 3.33, cap: float = 0.02) -> Column:
    """f = (p·b − q)/b, clamped [0, cap] — aether_oracle.py:343-352."""
    q = F.lit(1.0) - p
    return clamp((p * F.lit(float(b)) - q) / F.lit(float(b)), 0.0, cap)
