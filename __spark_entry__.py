"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``zcode_iceberg_spark/suite/`` — one module
per operator family, each entry pairing the Spark builder with its
DuckDB oracle SQL (see SURVEY.md §2 for the operator inventory).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zcode_iceberg_spark.suite import registry  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session settings to a driver-provided session.

    The driver builds its own SparkSession, so settings that matter for
    correctness (UTC, nanosecond-parquet handling, non-ANSI semantics)
    are applied here defensively; ``nanosAsLong`` is needed before the
    first read of events.parquet (nanosecond timestamps).
    """
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.ansi.enabled": "false",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf already set — fine
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    namesake metric — taker-delta z-score vs a trailing population
    (SURVEY E3+E4, strategy.py:1000-1043)."""
    _configure(spark)
    return registry()["delta_zscore"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted for non-SQL-expressible ops
    (those get the driver's weaker rows-only check)."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
