"""The local gate must be BIT-exact on floats, mirroring the driver's
value hash: -0.0 vs +0.0 (and any last-ulp drift) has to fail here, not
only at the driver. This is the regression class that kept
position_ledger locally "green" and driver-red for rounds 1-4 under the
old 1e-9-tolerance compare.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.harness import compare, exact_hash_match


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _df(spark, val: float):
    return spark.createDataFrame([(1, float(val))], "id int, x double")


def test_negative_zero_fails_compare(spark, con):
    # DuckDB round() preserves IEEE -0.0 (a decimal literal -0.0 does not)
    with pytest.raises(AssertionError, match="bit-mismatch"):
        compare(_df(spark, 0.0), con, "SELECT 1 AS id, round(-1e-9, 6) AS x", "negzero")


def test_negative_zero_fails_exact_hash(spark, con):
    assert not exact_hash_match(
        _df(spark, 0.0), con, "SELECT 1 AS id, round(-1e-9, 6) AS x"
    )


def test_last_ulp_drift_fails_compare(spark, con):
    # one ulp below 1.0 — far inside the old 1e-9 tolerance
    with pytest.raises(AssertionError, match="bit-mismatch"):
        compare(
            _df(spark, 0.9999999999999999),
            con,
            "SELECT 1 AS id, 1.0::DOUBLE AS x",
            "ulp",
        )


def test_equal_bits_and_nan_pass(spark, con):
    compare(_df(spark, 0.25), con, "SELECT 1 AS id, 0.25::DOUBLE AS x", "eq")
    nan_df = spark.createDataFrame([(1, float("nan"))], "id int, x double")
    compare(nan_df, con, "SELECT 1 AS id, 'nan'::DOUBLE AS x", "nan")
