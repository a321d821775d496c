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


# The driver's correctness gate checks the FIRST 50 registry entries, so
# ordering is part of the verification contract. Front-load (a) queries
# that have never received a driver CORRECTNESS row (the llm/stateful/
# media block) and (b) queries whose results changed this round; then a
# coverage-maximizing spread of the remaining suite. Queries pushed past
# the window all hold green rows in CORRECTNESS_r01/r02 and stay covered
# by tests/test_oracle_suite.py at sf0.001.
PRIORITY = [
    # never driver-checked (past the 50-row window in r1/r2)
    "dedup_cc", "dedup_incremental", "ann_lsh", "ann_ivf", "embedding_topk",
    "embedding_neardup", "kmeans", "tf_idf", "vocab_topk", "doc_split",
    "pii_scan", "doc_repetition", "domain_mix", "decontaminate",
    "seq_packing", "doc_chunks", "stratified_sample", "trend_hysteresis",
    "position_ledger", "ledger_daily_summary", "ledger_exit_stats",
    "media_features", "media_frames",
    # new or fixed this round: need a fresh green row
    "passage_dedup", "corpus_pipeline", "boilerplate_strip",
    "delta_zscore", "cvd", "volume_factor", "liquidity_velocity",
    "daily_order_summary", "pivot_priority_segment",
    # high-coverage keepers (each pins SURVEY §2 IDs nothing else covers)
    "ticks_normalize", "sessionize", "rolling_corr", "ohlc_1h", "atr_1h",
    "hurst", "bos_1h", "ema", "sequence_labels", "trend_classifier",
    "book_topk", "best_quotes", "imbalance", "wall_strength",
    "asof_trade_quote", "range_join_flow", "signal_scores", "trade_params",
]


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
    missing = [n for n in PRIORITY if n not in out]
    if missing:
        raise ValueError(f"PRIORITY names not in registry: {missing}")
    ordered = {n: out[n] for n in PRIORITY}
    ordered.update({n: q for n, q in out.items() if n not in ordered})
    return ordered
