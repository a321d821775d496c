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
    # Round-11 rotation (the r10 leave-behind plan, PLANS.md "Rotation
    # plan for round 11", executed; tools/rotate_priority.py over the
    # r1-r10 history). Front: queries whose RESULTS, ORACLES, or PLANS
    # changed this round —
    #   new: the exact-substring (ExactSubstr) family — substring_dedup
    #        (char-level maximal spans, md5-bucketed suffix groups),
    #        substring_dedup_persisted (daily-ingest probe of the
    #        persisted window-hash ledger, memoized), substring_ledger_build
    #        (the priced build, set-exact xor digest), and
    #        substring_decontaminate (the machinery pointed across the
    #        train/test boundary);
    #   oracle/plan changes, values locally gate-green: dsir_select
    #        (bucket stats fused to one groupBy both sides),
    #        lstm_bptt_micro (param emit via Decimal-repr HALF_UP
    #        quantization instead of Python half-to-even round).
    "substring_dedup",
    "substring_dedup_persisted",
    "substring_ledger_build",
    "substring_decontaminate",
    "dsir_select",
    "lstm_bptt_micro",
    # (a) the rest of the changed-oracle embedding family, never
    # driver-checked since the QUERY_PANEL_MAX_ID panel cap landed in
    # r10 (stale driver rows on changed oracles are the weakest
    # verification link; all locally gate-green at sf0.01)
    "ann_lsh",
    "ann_rp",
    "ann_rp_recall",
    "ann_sq8",
    "ann_sq8_recall",
    "ann_ivfsq",
    "ann_ivfsq_recall",
    "ann_ivf",
    "ann_ivf_recall",
    "ann_ivf_recall_probe4",
    "ann_ivf_bounded",
    "ann_ivf_bounded_recall",
    "embedding_neardup",
    # (b) the seven r6 greens the r10 window displaced
    "sole_latest_supplier",
    "lapsed_rich_customers",
    "customer_value_deciles",
    "cohort_set_ops",
    "copurchase_triangles",
    "nation_profit",
    "disjunctive_band_revenue",
    # (c) next-stalest driver-green rows (last row r6), rotation-tool
    # order. trend_lstm_training stays NOT re-queued: rows-only BY
    # DESIGN (r09 row recorded; training math hash-covered by
    # lstm_bptt_micro). Every query pushed past the window holds a
    # green r5-or-later driver row and stays oracle-checked at
    # sf0.001 on every pytest run (tests/test_oracle_suite.py).
    "returned_item_ranking",
    "top_revenue_supplier",
    "shipping_priority",
    "forecast_revenue",
    "part_value_concentration",
    "promo_revenue",
    "supplier_part_variety",
    "dominant_supplier",
    "minhash_signatures",
    "lsh_candidates",
    "dedup_near",
    "dedup_crosscheck",
    "ngram_jaccard",
    "doc_fingerprint",
    "heavy_hitters",
    "decontaminate",
    "seq_packing",
    "kmeans",
    "doc_chunks",
    "tf_idf",
    "bm25_scores",
    "trigram_lm",
    "stratified_sample",
    "dedup_cc",
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
