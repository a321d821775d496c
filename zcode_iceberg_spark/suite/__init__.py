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
    # Round-13 rotation (optimization round 2). Front: every query
    # whose PLAN or KERNEL changed this round — values locally
    # gate-green at sf0.01, oracles unchanged; the driver must
    # re-prove each hash:
    #   rfm_segments_approx: sketch accuracy changed in r12 but was
    #        never in an oracle window since (VERDICT r12 #9);
    #   decon_overlap_hll: exact counts + HLL estimates now one
    #        aggregate over the distinct-gram frame (one corpus pass);
    #   PQ family: encode/Lloyd assignment vectorized into one
    #        ArrowEvalPython kernel (decimal-exact mirror of the
    #        expression form); ann_ivfpq additionally shares the IVF
    #        assignment arm instead of recomputing it;
    #   FSM/hysteresis/scoring families: the position-FSM and
    #        hysteresis folds are vectorized (per-trade / per-run,
    #        bit-identical transitions), and scoring._features now
    #        persists its shared tick/bar frames (was 6 scans/plan).
    "rfm_segments_approx",
    "decon_overlap_hll",
    "ann_pq",
    "ann_pq_recall",
    "ann_ivfpq",
    "ann_ivfpq_recall",
    "ann_pq_persisted",
    "ann_pq_persisted_delete",
    "ann_pq_index_build",
    "equity_compounding",
    "wp_calibration",
    "risk_limits",
    "trade_params",
    "mc_win_prob",
    "signal_scores",
    "position_ledger",
    "ledger_daily_summary",
    "ledger_drawdown",
    "ledger_exit_stats",
    "live_pipeline_summary",
    "live_pipeline_ledger",
    "trend_hysteresis",
    "trend_dual_fusion",
    # displaced from the r12 plan by the two new ledger-build entries
    # (r12 leave-behind note) — rotated in as promised:
    "dedup_canonical",
    "coreset_kcenter",
    # Then the stalest driver greens, rotation-tool order (r8 cohort).
    # trend_lstm_training is EXCLUDED by design: it has no oracle
    # (rows-only; FIXTURES.md §5), so a window slot on it buys no hash
    # check — its training math stays covered by lstm_bptt_micro and
    # tests/test_lstm_training.py. Every query pushed past the window
    # holds a green driver row from an earlier round and stays
    # oracle-checked at sf0.001 by tests/test_oracle_suite.py.
    "ticks_normalize",
    "zorder_layout",
    "compaction_plan",
    "return_moments",
    "scd2_versions",
    "scd2_incremental",
    "funnel_conversion",
    "cohort_retention",
    "event_transitions",
    "robust_outliers",
    "cusum_alarm",
    "volume_hhi",
    "session_paths",
    "sessionize",
    "delta_zscore",
    "rolling_corr",
    "ohlc_1h",
    "atr_1h",
    "liquidity_velocity",
    "hurst",
    "bos_1h",
    "ema",
    "depth_slippage",
    "table_expectations",
    "cumulative_customer_value",
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
