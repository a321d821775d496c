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
    # Round-12 rotation (the r11 leave-behind plan, PLANS.md "Rotation
    # plan for round 12", executed; tools/rotate_priority.py over the
    # r1-r11 history). Front: queries NEW or changed this round —
    #   new: the persisted-ledger DELETION family (takedown /
    #        PII-removal, VERDICT r11 #7): dedup_persisted_delete,
    #        neardup_persisted_delete, substring_persisted_delete —
    #        via the ledger_delete / read_with_tombstones /
    #        fold_tombstones maintenance seam (sources/sinks.py);
    #        and dsir_stats_build (the DSIR importance model priced as
    #        its own fresh-build entry, VERDICT r11 #3);
    #   plan changes, values locally gate-green, oracles unchanged:
    #        dsir_select (memoized model + one scoring pass),
    #        mmr_rerank / mmr_rerank_ann / mmr_ann_overlap (the greedy
    #        collapsed to one applyInPandas kernel, VERDICT r11 #2),
    #        dedup_quality_keeper / cluster_safe_split (shared
    #        canonical-map artifact, VERDICT r11 #4).
    "dedup_persisted_delete",
    "neardup_persisted_delete",
    "substring_persisted_delete",
    "ann_ivf_persisted_delete",
    "ann_pq_persisted_delete",
    "dsir_stats_build",
    # r12 optimization round: the exact-hash and LSH persisted probes
    # are now memoized per session (the substring/PQ/IVF accounting),
    # their fresh builds priced by these two NEW hash-oracled entries —
    # front-loaded per rotation policy; dedup_canonical and
    # coreset_kcenter (green this round's local gate) displace to r13.
    "dedup_ledger_build",
    "neardup_ledger_build",
    "dsir_select",
    "mmr_rerank",
    "mmr_rerank_ann",
    "mmr_ann_overlap",
    "dedup_quality_keeper",
    "cluster_safe_split",
    # Then the stalest never-rechecked driver greens, rotation-tool
    # order (last green row r6/r7; trend_lstm_training rows-only BY
    # DESIGN — it has no oracle; the training math is hash-covered by
    # lstm_bptt_micro). Every query pushed past the window holds a
    # green driver row from an earlier round and stays oracle-checked
    # at sf0.001 on every pytest run (tests/test_oracle_suite.py).
    "trend_lstm_training",
    "trend_hysteresis",
    "media_frames",
    "media_resize",
    "gap_fill_1h",
    "trend_classifier_weights",
    "trend_probe_training",
    "realized_vol",
    "iceberg_refill",
    "wall_strength",
    "pricing_summary",
    "price_percentiles",
    "price_percentiles_approx",
    "star_revenue",
    "top_customers_per_nation",
    "priority_with_discounted",
    "customers_without_orders",
    "rollup_sales",
    "distinct_parts_per_supplier",
    "approx_distinct_parts",
    "trade_params",
    "mc_win_prob",
    "dedup_exact",
    "dup_spans",
    "training_export",
    "simhash",
    "lang_id",
    "text_quality",
    "token_counts",
    "token_histogram",
    "bpe_merges",
    "bpe_segment",
    "dedup_incremental_persisted",
    "neardup_incremental_persisted",
    "lm_perplexity",
    "dedup_cc_twostar",
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
