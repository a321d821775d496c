"""Oracle-checked query suite.

Each submodule exports ``QUERIES: dict[str, Query]`` mapping a stable
name (keyed to SURVEY.md §2 operator IDs) to a Spark builder plus an
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` flattens this
registry for the driver.

Conventions that make the value-hash comparison deterministic:
- every float output column is rounded to 6 decimals on BOTH sides;
- no raw TIMESTAMP outputs — dates/buckets are formatted as strings;
- ROWS window frames always order by (ts, <unique id>) on both sides;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One suite entry: Spark builder + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def registry() -> dict[str, Query]:
    from zcode_iceberg_spark.suite import (
        flow,
        timeseries,
        orderbook,
        relational,
        scoring,
        llm,
        stateful,
        media,
    )

    out: dict[str, Query] = {}
    for mod in (flow, timeseries, orderbook, relational, scoring, llm, stateful, media):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
