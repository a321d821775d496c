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
    # fixed this round: HUGEINT->BIGINT oracle dtype casts
    "pii_scan", "doc_repetition",
    # newly oracled this round: recursive-CTE FSM walk
    "position_ledger", "ledger_daily_summary", "ledger_exit_stats",
    # past-cap in r3 (driver rows last seen r2; mc_win_prob and
    # price_percentiles_approx never driver-checked)
    "realized_vol", "pricing_summary", "price_percentiles",
    "price_percentiles_approx", "star_revenue", "top_customers_per_nation",
    "priority_with_discounted", "customers_without_orders", "rollup_sales",
    # token_histogram (early-r4, never driver-checked) outranks the
    # r1-stale cumulative_customer_value, whose running-sum window
    # shape is in-window via ledger_drawdown's equity curve
    "token_histogram", "distinct_parts_per_supplier",
    "approx_distinct_parts", "segment_share", "cube_corpus",
    "above_customer_avg", "unpivot_lineitem_stats", "mc_win_prob",
    "dedup_exact", "minhash_signatures", "lsh_candidates", "dedup_near",
    "dedup_crosscheck", "simhash", "ngram_jaccard", "doc_fingerprint",
    "lang_id", "text_quality", "token_counts",
    # new queries (never driver-checked) take keeper slots: cvd's E6
    # math stays exercised in-window via signal_scores' feature frame,
    # best_quotes' C3 top-1 via book_topk's C1/C2 window; both remain
    # locally oracle-checked by tests/test_oracle_suite.py
    "semantic_dedup", "corpus_shuffle",
    # ledger_drawdown (new) rides the FSM block already in-window;
    # imbalance's E1 math stays pinned via wall_strength (which
    # consumes the same depth totals) and signal_scores
    "ledger_drawdown",
    # wp_calibration (new) closes the predicted-vs-realized loop; it
    # takes delta_zscore's slot — the z chain (E3/E4) is the `dec` CTE
    # that trend_hysteresis + the three ledger oracles all hash-verify
    "wp_calibration",
    # training_export (new) composes survivors→packing→shuffle; it
    # takes ohlc_1h's slot — the hourly-bar construction (E8) is
    # hash-verified transitively inside wp_calibration's and
    # mc_win_prob's ATR CTE chains, both in-window
    "training_export",
    # iceberg_refill (new, the namesake detector) takes
    # ticks_normalize's slot — the ingest normalization is the shared
    # substrate of every ticks oracle in the window (EVENTS_TICKS_SQL /
    # events_ticks), so a break there fails dozens of rows loudly
    "iceberg_refill",
    # temperature_mix + modality_interleave (new oracles) take the
    # sessionize and range_join_flow slots: both displaced queries are
    # r3-green AND carry batch<->stream agreement tests (their core
    # semantics stay exercised end-to-end every pytest run)
    "temperature_mix", "modality_interleave",
    # high-coverage keepers (r3-green; each pins SURVEY §2 IDs the rows
    # above don't cover)
    "wall_strength", "trade_params",
    # late-r4 additions (never driver-checked) take five keeper slots,
    # each displacing an r3-green query whose semantics stay
    # hash-verified transitively or by every-pytest agreement tests:
    # gap_fill_1h ← ema (the F.aggregate fold family stays in-window
    # via bpe_segment's apply_merge folds; ema r3-green + oracle-tested
    # at sf0.001 every pytest); heavy_hitters ← book_topk (C1/C2
    # top-k window plan asserted in test_plans; wall_strength consumes
    # the same depth totals in-window); decon_overlap_hll ←
    # signal_scores (its FEATURES_CTE + _WP expression is embedded and
    # hash-verified inside wp_calibration, in-window); bpe_merges ←
    # trend_hysteresis (r3-green, gaps-and-islands oracle + batch↔
    # stream agreement every pytest; its z-label `dec` chain is
    # in-window via the three ledger oracles); bpe_segment ←
    # asof_trade_quote (r3-green, union+last kernel exercised by the
    # stream-twin agreement tests every pytest)
    "gap_fill_1h", "heavy_hitters", "decon_overlap_hll",
    "bpe_merges", "bpe_segment",
    # dup_spans (new, never driver-checked) takes passage_dedup's slot:
    # same shared kernel, strictly finer output, r3-green rotates out;
    # quality_sample (new oracle) takes corpus_pipeline's slot — the
    # pipeline's dedup/quality/split prefix is in-window via
    # training_export (shared _PIPE_SP_CTES), its decon stage r3-green
    "dup_spans", "quality_sample",
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
    if len(PRIORITY) != len(set(PRIORITY)) or len(PRIORITY) != WINDOW:
        raise ValueError(
            f"PRIORITY must be {WINDOW} unique names, got {len(PRIORITY)} "
            f"({len(PRIORITY) - len(set(PRIORITY))} duplicate(s))"
        )
    ordered = {n: out[n] for n in PRIORITY}
    ordered.update({n: q for n, q in out.items() if n not in ordered})
    return ordered
