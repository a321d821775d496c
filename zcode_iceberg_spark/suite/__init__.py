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
# ordering is part of the verification contract. Rotation policy (see
# SCALE.md "Verification-window rotation"): front-load (a) queries whose
# results or oracles changed this round and (b) the queries longest
# without a driver row; fill the rest with a coverage-maximizing keeper
# spread. Queries pushed past the window all hold green driver rows from
# an earlier round and stay covered by tests/test_oracle_suite.py at
# sf0.001. WINDOW pins the driver's cap; registry() asserts PRIORITY is
# duplicate-free and exactly WINDOW long so the rotation can't drift
# silently (a dup would dedupe via the dict and shift a different query
# into the checked window).
WINDOW = 50

PRIORITY = [
    # Round-9 rotation (tools/rotate_priority.py over r1-r8 history +
    # this round's delta). Front: queries whose RESULTS or ORACLES
    # changed this round — the five new entries (lstm_trend_micro,
    # trend_dual_fusion, rfm_segments_approx, live_pipeline_ledger,
    # live_pipeline_summary, equity_compounding — displacing
    # vocab_topk and bpe_encode, both green r5; the top-k and
    # BPE-segment kernels stay pytest-oracled at sf0.001),
    # the dual-retrained rows-only trend_lstm_training, the 9
    # IVF-family queries (Lloyd-trained centroids changed every row),
    # and funnel_conversion (0-denominator guard changed the oracle).
    # Then the FIFTEEN r5 greens displaced by r8's mid-round additions
    # (VERDICT r8 task #1 — the stalest driver rows in the registry),
    # then the next-stalest r5 greens per the rotation tool. Every
    # query pushed past the window holds a green r8-or-earlier driver
    # row and stays oracle-checked at sf0.001 on every pytest run
    # (tests/test_oracle_suite.py).
    # Session-2 additions (no driver row yet — new queries lead the
    # window per the rotation policy; the sixteen tail slots they
    # consume — order_count_distribution, large_orders,
    # nation_trade_volume, market_share, cheapest_supplier_per_part,
    # above_customer_avg, pivot_priority_segment, late_ship_exists,
    # unpivot_lineitem_stats, passage_dedup, signal_scores,
    # boilerplate_strip, corpus_pipeline, lsh_precision, lsh_recall,
    # lsh_recall_rebanded — all hold green r5-or-later driver rows and
    # stay oracle-checked at sf0.001 on every pytest run).
    "dedup_bloom",
    "dedup_bloom_persisted",
    "cms_heavy_hitters",
    "cms_heavy_hitters_persisted",
    "record_linkage",
    "containment_dedup",
    "ols_regression",
    "ols_by_segment",
    "dedup_quality_keeper",
    "token_budget_mix",
    "decontaminate_bloom",
    "cluster_safe_split",
    "seasonal_decompose",
    "seasonal_anomaly",
    "attribution_last_touch",
    "holt_forecast",
    "trend_lstm_training",
    "lstm_trend_micro",
    "trend_dual_fusion",
    "rfm_segments_approx",
    "live_pipeline_ledger",
    "live_pipeline_summary",
    "equity_compounding",
    "funnel_conversion",
    "ann_ivf",
    "ann_ivf_recall",
    "ann_ivf_bounded",
    "ann_ivf_bounded_recall",
    "ann_ivfpq",
    "ann_ivfpq_recall",
    "ann_ivfsq",
    "ann_ivfsq_recall",
    "ann_ivf_incremental_persisted",
    # the 15 displaced r5 greens
    "ticks_normalize",
    "event_transitions",
    "volume_hhi",
    "session_paths",
    "cvd",
    "volume_factor",
    "bar_dod_change",
    "sequence_labels",
    "trend_classifier",
    "book_topk",
    "best_quotes",
    "imbalance",
    "asof_trade_quote",
    "range_join_flow",
    "rfm_segments",
    # next-stalest r5 greens (rotation-tool order)
    "segment_share",
    "cube_corpus",
]


def registry() -> dict[str, Query]:
    from zcode_iceberg_spark.suite import (
        flow,
        timeseries,
        orderbook,
        relational,
        scoring,
        llm,
        linkage,
        stateful,
        media,
        formats,
    )

    out: dict[str, Query] = {}
    for mod in (
        flow, timeseries, orderbook, relational, scoring, llm, linkage,
        stateful, media, formats,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    missing = [n for n in PRIORITY if n not in out]
    if missing:
        raise ValueError(f"PRIORITY names not in registry: {missing}")
    if len(PRIORITY) != len(set(PRIORITY)) or len(PRIORITY) != WINDOW:
        raise ValueError(
            f"PRIORITY must be {WINDOW} unique names, got {len(PRIORITY)} "
            f"({len(PRIORITY) - len(set(PRIORITY))} duplicate(s))"
        )
    ordered = {n: out[n] for n in PRIORITY}
    ordered.update({n: q for n, q in out.items() if n not in ordered})
    return ordered
