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
    # Round-10 rotation (VERDICT r9 #1; tools/rotate_priority.py over
    # the r1-r9 history + this round's delta). Front: queries whose
    # RESULTS, ORACLES, or PLANS changed this round —
    #   new: lstm_bptt_micro (hash-oracled micro-BPTT training),
    #        ann_pq_index_build / ann_ivf_index_build (the persisted
    #        indexes' build phase, split from the probe);
    #   result/oracle fixes: seasonal_anomaly (var>0 z guard),
    #        attribution_last_touch (deterministic touch-tie pre-dedup);
    #   oracle-text/plan changes, values unchanged: the Bloom family
    #        (redundant DISTINCT dropped both sides), the MMR family
    #        (shared persisted pool subtree), both persisted-ANN
    #        probes (build memoized out of the probe measurement).
    # Then the stalest driver-green rows per the rotation tool: the
    # twenty r5 greens the r9 window displaced, then r6 greens.
    # trend_lstm_training is deliberately NOT re-queued: it is
    # rows-only BY DESIGN (no oracle can exist), its rows-only row is
    # recorded in r09, and its training math is now hash-covered by
    # lstm_bptt_micro — re-checking it would waste a window slot.
    # Every query pushed past the window holds a green r5-or-later
    # driver row and stays oracle-checked at sf0.001 on every pytest
    # run (tests/test_oracle_suite.py).
    "lstm_bptt_micro",
    "dsir_select",
    "ann_pq_index_build",
    "ann_ivf_index_build",
    "seasonal_anomaly",
    "attribution_last_touch",
    "dedup_bloom",
    "dedup_bloom_persisted",
    "decontaminate_bloom",
    "mmr_rerank",
    "mmr_rerank_ann",
    "mmr_ann_overlap",
    "ann_pq_persisted",
    "ann_ivf_incremental_persisted",
    # the twenty stalest greens (last driver row r5)
    "pivot_priority_segment",
    "signal_scores",
    "passage_dedup",
    "boilerplate_strip",
    "corpus_pipeline",
    "lsh_precision",
    "lsh_recall",
    "lsh_recall_rebanded",
    "bpe_encode",
    "vocab_topk",
    "doc_split",
    "dedup_incremental",
    "domain_mix",
    "daily_uniques_rollup",
    "daily_quantiles_rollup",
    "pagerank",
    "weighted_sample",
    "corpus_drift_psi",
    "position_ledger",
    "risk_limits",
    # next-stalest (last driver row r6), rotation-tool order
    "order_count_distribution",
    "large_orders",
    "nation_trade_volume",
    "market_share",
    "cheapest_supplier_per_part",
    "above_customer_avg",
    "unpivot_lineitem_stats",
    "late_ship_exists",
    "priority_line_buckets",
    "small_quantity_revenue",
    # representative slice of the fixed-panel oracle change (the whole
    # embedding family's oracle text gained the QUERY_PANEL_MAX_ID
    # predicate — values PROVEN unchanged by two local 26/26 gate
    # passes; the driver re-checks the shared ground-truth arm, the
    # two headline-fixed recall panels, and the PQ/IVFADC pair, plus
    # the 7 family members already in the window above)
    "embedding_topk",
    "ann_pq",
    "ann_pq_recall",
    "ann_ivfpq",
    "ann_ivfpq_recall",
    "semantic_dedup",
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
