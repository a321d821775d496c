"""Property-based checks for the scalar expression library (SURVEY §5:
operators with no SQL oracle get self-consistency properties). Driven
by hypothesis; each example evaluates every expression in one small
Spark job over a generated batch.

The Φ check is the strong one: the Abramowitz–Stegun polynomial the
engine (and its DuckDB oracles) use must stay within its documented
7.5e-8 absolute error of the true normal CDF — compared against
0.5·(1+erf(x/√2)) from the Python stdlib, an independent
implementation.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from zcode_iceberg_spark.functions.scalar import (
    clamp,
    kelly_fraction,
    normal_cdf,
    sigmoid,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _eval(spark, xs, exprs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    cols = [e.alias(f"c{i}") for i, e in enumerate(exprs)]
    rows = df.select(F.col("x"), *cols).collect()
    return rows


@settings(max_examples=8, deadline=None)
@given(st.lists(finite, min_size=1, max_size=32))
def test_clamp_sigmoid_kelly_bounds(spark, xs):
    rows = _eval(
        spark,
        xs,
        [
            clamp(F.col("x"), -1.0, 1.0),
            sigmoid(F.col("x")),
            kelly_fraction(clamp(F.col("x"), 0.0, 1.0)),
        ],
    )
    for r in rows:
        assert -1.0 <= r["c0"] <= 1.0
        assert r["c0"] == max(-1.0, min(1.0, r["x"]))
        # float64 saturates to exactly 0.0/1.0 for |x| ≳ 37 — bounds
        # are closed, not open
        assert 0.0 <= r["c1"] <= 1.0
        assert 0.0 <= r["c2"] <= 0.02  # Kelly cap (config cap=0.02)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(min_value=-8, max_value=8, allow_nan=False), min_size=1, max_size=32))
def test_normal_cdf_matches_stdlib_erf(spark, xs):
    rows = _eval(spark, xs, [normal_cdf(F.col("x"))])
    for r in rows:
        truth = 0.5 * (1.0 + math.erf(r["x"] / math.sqrt(2.0)))
        assert abs(r["c0"] - truth) < 7.5e-8, (r["x"], r["c0"], truth)
        assert 0.0 <= r["c0"] <= 1.0


def test_normal_cdf_monotone_and_symmetric(spark):
    xs = [x / 10.0 for x in range(-60, 61)]
    rows = sorted(_eval(spark, xs, [normal_cdf(F.col("x"))]), key=lambda r: r["x"])
    vals = [r["c0"] for r in rows]
    assert all(a <= b for a, b in zip(vals, vals[1:]))  # monotone
    mid = dict((round(r["x"], 1), r["c0"]) for r in rows)
    for x in (0.5, 1.0, 2.0, 4.0):
        # Φ(-x) ≈ 1 - Φ(x) within twice the polynomial's error bound
        assert abs(mid[-x] - (1.0 - mid[x])) < 1.5e-7
    assert abs(mid[0.0] - 0.5) < 7.5e-8


def test_mc_sampled_converges_to_closed_form(spark, sf_dir):
    """G8 convergence property: the sampled Monte-Carlo win probability
    must approach Φ(μ/σ) at the O(1/√N) Monte-Carlo rate. With N=4096
    the binomial standard error is ≤ 0.5/√N ≈ 0.008; a 6-sigma band
    keeps this deterministic-in-practice without hiding real bias. The
    clamp to [0.01, 0.99] means extreme-μ keys sit exactly on the
    clamp on both sides, which the bound tolerates by construction."""
    from zcode_iceberg_spark.suite.scoring import mc_win_prob_full

    rows = mc_win_prob_full(spark, sf_dir, n_paths=4096).collect()
    assert rows
    worst = max(r["mc_abs_err"] for r in rows)
    assert worst <= 6 * 0.5 / (4096 ** 0.5), worst


def test_approx_percentiles_track_exact(spark, sf_dir):
    """The t-digest scale path must stay within sketch tolerance of the
    exact percentiles it substitutes for at 100 TB — asserted by the
    query's own rank-tolerance audit flags (duplicate-value-safe
    two-sided rank check; see q_price_percentiles_approx)."""
    from zcode_iceberg_spark.suite.relational import q_price_percentiles_approx

    rows = q_price_percentiles_approx(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ok25"] and r["ok50"] and r["ok75"], r
        assert r["n"] > 0


def test_approx_distinct_tracks_exact(spark, sf_dir):
    """HLL++ estimate lands within 5× its configured rsd of exact —
    asserted by the query's own audit flag."""
    from zcode_iceberg_spark.suite.relational import q_approx_distinct_parts

    rows = q_approx_distinct_parts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_ok"], r


@given(
    st.lists(
        st.integers(min_value=-10**12, max_value=10**12), min_size=1, max_size=20
    )
)
@settings(max_examples=60, deadline=None)
def test_half_away_integer_division_matches_fractions(vals):
    """The repo-wide exact-mean convention — (2s+n) DIV (2n) with the
    sign split (operators/stateful.avg_micro_exact, rfm_segments'
    avg_monetary) — must equal round-half-away-from-zero of the true
    rational mean for ANY integer sum, including the negatives and the
    exact .5 boundaries where banker's rounding and truncation both
    diverge. Pure-python mirror of the SQL integer arithmetic vs
    fractions.Fraction ground truth."""
    from fractions import Fraction

    s, n = sum(vals), len(vals)
    got = (2 * s + n) // (2 * n) if s >= 0 else -((2 * -s + n) // (2 * n))
    q = Fraction(s, n)
    # round half away from zero, exactly
    want = (abs(q).numerator * 2 + abs(q).denominator) // (2 * abs(q).denominator)
    want = want if q >= 0 else -want
    assert got == want, (s, n, got, want)
