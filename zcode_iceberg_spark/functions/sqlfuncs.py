"""SQL-surface registration for the scalar library.

Spark 4 SQL scalar UDFs (``CREATE FUNCTION ... RETURNS ... RETURN
<expression>``) are *expression macros*: the body inlines into the
Catalyst plan at resolution time, so a SQL user calling ``norm_cdf(x)``
gets exactly the same whole-stage-codegen arithmetic as the Column API
(:mod:`zcode_iceberg_spark.functions.scalar`) — no Python, no UDF call
boundary, no serialization. This closes the API-surface gap: every
scoring scalar (SURVEY G-group) is callable from ``spark.sql`` text as
well as from DataFrame code, with one shared formula source.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from zcode_iceberg_spark.functions.scalar import normal_cdf_sql


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the scalar library as temporary SQL functions; returns
    the registered names. Idempotent (CREATE OR REPLACE)."""
    defs = {
        "norm_cdf": (
            "(x DOUBLE) RETURNS DOUBLE RETURN " + normal_cdf_sql("x")
        ),
        "sigmoid": (
            "(x DOUBLE) RETURNS DOUBLE RETURN "
            "1.0 / (1.0 + exp(-least(greatest(x, -500.0), 500.0)))"
        ),
        "clamp": (
            "(x DOUBLE, lo DOUBLE, hi DOUBLE) RETURNS DOUBLE RETURN "
            "least(greatest(x, lo), hi)"
        ),
        "kelly": (
            "(p DOUBLE, b DOUBLE, cap DOUBLE) RETURNS DOUBLE RETURN "
            "least(greatest((p * b - (1.0 - p)) / b, 0.0), cap)"
        ),
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(defs)
