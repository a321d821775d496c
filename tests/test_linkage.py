"""Property + plan tests for the structured-curation block
(suite/linkage.py): Bloom-gated dedup, Count-Min sketch, blocked
record linkage, containment near-dup, closed-form OLS.

The cross-engine value agreement is covered per-query by
tests/test_oracle_suite.py; these tests pin the SEMANTIC guarantees
the oracle comparison can't see (no false negatives, no undercounts,
bounded pair generation) and the physical plan shapes the docstrings
claim."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pandas as pd

from zcode_iceberg_spark.suite import linkage


def _plan(spark, sf_dir, name: str) -> str:
    df = linkage.QUERIES[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------------ bloom


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom's one hard guarantee: every exact duplicate is flagged a
    candidate. A single violation means the bitset build or the probe
    lost a position."""
    rows = linkage.QUERIES["dedup_bloom"].fn(spark, sf_dir).collect()
    assert rows, "batch should be non-empty"
    for r in rows:
        if r.is_exact_dup:
            assert r.bloom_candidate, f"false negative at doc {r.doc_id}"


def test_bloom_flags_planted_dup_not_uniques(spark, tmp_path):
    """Synthetic corpus with a KNOWN cross-split duplicate: the dup is
    flagged, and the unique batch docs are not (with 4×32-bit lanes
    over a 2¹⁸-bit filter and a few hundred set bits, a false positive
    on this fixed corpus would mean the position derivation is wrong,
    not bad luck — the hashes are deterministic)."""
    docs = [(i, f"unique hist text {i} padding words") for i in range(80)]
    docs += [(80 + i, f"unique batch text {i} more words") for i in range(19)]
    docs.append((99, docs[3][1]))  # doc 99 duplicates hist doc 3
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = str(tmp_path / "synth")
    df.write.parquet(f"{out}/documents.parquet")
    rows = {
        r.doc_id: r
        for r in linkage.QUERIES["dedup_bloom"].fn(spark, out).collect()
    }
    assert rows[99].bloom_candidate and rows[99].is_exact_dup
    for i in range(80, 99):
        assert not rows[i].is_exact_dup
        assert not rows[i].bloom_candidate, f"false positive at {i}"


def test_bloom_bitset_is_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "dedup_bloom")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# -------------------------------------------------------------------- CMS


def test_cms_never_undercounts(spark, sf_dir):
    """min-over-depths of non-negative cell sums ≥ true count — the
    Count-Min guarantee. An undercount means a lane's positions
    diverged between build and probe."""
    rows = linkage.QUERIES["cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == linkage.CMS_TOPN
    for r in rows:
        assert r.cms_est >= r.exact_cnt, r.tok
        assert r.overcount == r.cms_est - r.exact_cnt


def test_cms_sketch_is_constant_size(spark, sf_dir):
    """The sketch the estimates join against is ≤ D×W rows regardless
    of corpus size — the mergeable-sketch contract."""
    p = _plan(spark, sf_dir, "cms_heavy_hitters")
    assert "BroadcastHashJoin" in p  # cells side is broadcast
    assert "CartesianProduct" not in p


# ---------------------------------------------------------- record linkage


def test_record_linkage_pairs_are_distinct_spellings(spark, sf_dir):
    rows = linkage.QUERIES["record_linkage"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # stage-1 collapse means lev=0 pairs cannot exist
        assert 1 <= r.lev_dist <= linkage.LINK_MAX_LEV
        assert r.name_a < r.name_b
        # blocking key: same final noun
        assert r.name_a.split()[-1] == r.name_b.split()[-1]
        assert r.n_a >= 1 and r.n_b >= 1


def test_record_linkage_no_cartesian(spark, sf_dir):
    p = _plan(spark, sf_dir, "record_linkage")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ------------------------------------------------------------- containment


def test_containment_bounds_and_order(spark, sf_dir):
    rows = (
        linkage.QUERIES["containment_dedup"].fn(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert linkage.CONT_MIN <= r.containment <= 1.0
        assert r.inter_cnt >= 1


def test_containment_includes_exact_dups(spark, sf_dir):
    """Exact duplicate docs (the corpus plants them — dedup_exact
    finds >0) have containment 1.0, so the pair set must contain at
    least one 1.0 pair if any planted dup shares a rare shingle."""
    rows = (
        linkage.QUERIES["containment_dedup"].fn(spark, sf_dir).collect()
    )
    assert any(abs(r.containment - 1.0) < 1e-9 for r in rows)


def test_containment_no_cartesian(spark, sf_dir):
    p = _plan(spark, sf_dir, "containment_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# -------------------------------------------------------------------- OLS


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """The closed-form moment solve must agree with an independent
    dense least-squares fit (numpy lstsq over the raw rows) — the
    cross-check that the Cramer algebra is right, not just
    cross-engine consistent."""
    row = linkage.QUERIES["ols_regression"].fn(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    X = np.column_stack(
        [np.ones(len(li)), li["l_quantity"].values, li["l_discount"].values]
    )
    y = li["l_extendedprice"].values
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert row.n_rows == len(li)
    assert abs(row.b0 - beta[0]) < 1e-3 * max(1.0, abs(beta[0]))
    assert abs(row.b1 - beta[1]) < 1e-3 * max(1.0, abs(beta[1]))
    assert abs(row.b2 - beta[2]) < 1e-3 * max(1.0, abs(beta[2]))
    assert abs(row.r2 - r2) < 1e-6


def test_ols_single_scan_partial_agg(spark, sf_dir):
    """One pass: exactly one lineitem scan, map-side partial
    aggregation below the 1-row exchange."""
    import re

    p = _plan(spark, sf_dir, "ols_regression")
    # formatted mode prints each node once in the tree and once in the
    # detail section — count the numbered detail entries only
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1
    assert "partial" in p.lower()
    assert "Exchange" in p


# ------------------------------------------------------------ scale smokes


def test_bloom_candidate_mass_bounded_under_flood(spark, sf_dir, tmp_path):
    """100× duplicate flood: replicate the batch's duplicate texts and
    confirm the bloom probe stays a broadcast join (the byte table
    size is corpus-bound, M/8 rows max, independent of batch size)."""
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = d.count()
    # interleave replicas across the id space (rep-major) so every
    # text lands on BOTH sides of the historical/batch split
    flood = d.crossJoin(
        F.broadcast(spark.range(100).select(F.col("id").alias("rep")))
    ).select(
        (F.col("rep") * n_docs + F.col("doc_id")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    out = str(tmp_path / "flood")
    flood.write.parquet(f"{out}/documents.parquet")
    for t in ["part", "lineitem"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.parquet(
            f"{out}/{t}.parquet"
        )
    df = linkage.QUERIES["dedup_bloom"].fn(spark, out)
    n = df.count()
    flagged = df.filter("bloom_candidate").count()
    assert n > 0 and 0 < flagged <= n


def test_bloom_persisted_matches_inline(spark, sf_dir):
    """The persisted-state variant (maintenance-layer build, OR-merge,
    in-build replay-idempotence check) must reproduce the inline
    query's rows exactly."""
    inline = {
        tuple(r)
        for r in linkage.QUERIES["dedup_bloom"].fn(spark, sf_dir).collect()
    }
    persisted = {
        tuple(r)
        for r in linkage.QUERIES["dedup_bloom_persisted"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert inline == persisted and inline


def test_cms_sketches_merge_cellwise(spark, sf_dir):
    """The mergeability contract: per-source sketches summed cell-wise
    must equal the whole-corpus sketch EXACTLY (counts add) — the
    property that lets daily/shard sketches roll up without rescans,
    same as the HLL/KLL/KMV families."""
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")

    def cells(df, extra_keys):
        with_pos = df.select(
            *extra_keys,
            *[
                linkage._cms_pos_spark(F.col("tok"), s).alias(f"pos{i}")
                for i, s in enumerate(linkage.CMS_SEEDS)
            ],
        )
        lanes = ", ".join(
            f"{i}, pos{i}" for i in range(len(linkage.CMS_SEEDS))
        )
        return (
            with_pos.selectExpr(
                *extra_keys,
                f"stack({len(linkage.CMS_SEEDS)}, {lanes}) AS (d, pos)",
            )
            .groupBy(*extra_keys, "d", "pos")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    per_source = cells(toks, ["source"])
    merged = {
        (r.d, r.pos): r.total
        for r in per_source.groupBy("d", "pos")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }
    whole = {(r.d, r.pos): r.cnt for r in cells(toks, []).collect()}
    assert merged == whole and whole


def test_ols_by_segment_matches_per_group_numpy(spark, sf_dir):
    """Grouped moments must reproduce an independent per-group dense
    fit — one group checked against numpy lstsq end-to-end."""
    rows = {
        r.c_mktsegment: r
        for r in linkage.QUERIES["ols_by_segment"].fn(spark, sf_dir).collect()
    }
    assert len(rows) >= 2
    seg = sorted(rows)[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    j = j[j["c_mktsegment"] == seg]
    X = np.column_stack(
        [np.ones(len(j)), j["l_quantity"].values, j["l_discount"].values]
    )
    y = j["l_extendedprice"].values
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    r = rows[seg]
    assert r.n_rows == len(j)
    assert abs(r.b1 - beta[1]) < 1e-3 * max(1.0, abs(beta[1]))
    assert abs(r.b2 - beta[2]) < 1e-3 * max(1.0, abs(beta[2]))


def test_quality_keeper_one_per_cluster_and_max_quality(spark, sf_dir):
    """Exactly one keeper per canonical cluster, and no member
    out-scores it (ties break to the smaller doc_id)."""
    rows = (
        linkage.QUERIES["dedup_quality_keeper"].fn(spark, sf_dir).collect()
    )
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.canonical_id, []).append(r)
    assert any(len(m) > 1 for m in by_cluster.values())  # real clusters
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1, cid
        k = keepers[0]
        best = max(m.quality for m in members)
        assert k.quality == best
        ties = [m.doc_id for m in members if m.quality == best]
        assert k.doc_id == min(ties)
        assert all(m.group_size == len(members) for m in members)


def test_token_budget_mix_fills_each_source_budget(spark, sf_dir):
    """Per source: the selected docs' token mass reaches the budget
    (every doc STARTING inside the budget is taken whole) and stops
    within one document of it; unselected docs all start at or past
    the budget."""
    import math

    rows = linkage.QUERIES["token_budget_mix"].fn(spark, sf_dir).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    assert len(per_src) >= 2
    for src, members in per_src.items():
        total = sum(m.n_tokens for m in members)
        budget = math.floor(linkage.MIX_BUDGET_FRAC * total)
        sel = [m for m in members if m.selected]
        unsel = [m for m in members if not m.selected]
        sel_mass = sum(m.n_tokens for m in sel)
        assert sel, src
        assert sel_mass >= budget
        assert sel_mass - max(m.n_tokens for m in sel) < budget
        for m in unsel:
            assert m.cum_before >= budget


def test_decontaminate_bloom_never_misses_contamination(spark, sf_dir):
    """Per test doc: bloom hits ≥ exact hits (no false negatives —
    the property that makes a Bloom screen SAFE for leakage checks),
    and the flag fires for every doc the exact screen would flag."""
    rows = (
        linkage.QUERIES["decontaminate_bloom"].fn(spark, sf_dir).collect()
    )
    assert rows
    from zcode_iceberg_spark.suite.llm import DECON_FLAG

    for r in rows:
        assert r.n_hit_bloom >= r.n_hit_exact, r.doc_id
        assert r.bloom_overcount == r.n_hit_bloom - r.n_hit_exact
        if r.n_hit_exact / r.n_grams >= DECON_FLAG:
            assert r.flagged, r.doc_id


def test_cluster_safe_split_never_straddles(spark, sf_dir):
    """The invariant the query exists for: every near-dup cluster maps
    to exactly one split; and on this corpus (planted near-dups) the
    doc-level naive assignment WOULD have leaked at least one cluster
    across splits."""
    rows = (
        linkage.QUERIES["cluster_safe_split"].fn(spark, sf_dir).collect()
    )
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.canonical_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert any(r.naive_leak for r in rows)
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_new_curation_plans_no_cartesian(spark, sf_dir):
    for name in (
        "token_budget_mix",
        "ols_by_segment",
        "decontaminate_bloom",
        "cluster_safe_split",
        "dedup_quality_keeper",
        "dedup_bloom_persisted",
        "cms_heavy_hitters_persisted",
    ):
        p = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_decontaminate_bloom_bitset_broadcast(spark, sf_dir):
    """The train-gram byte table must reach the test probe as a
    broadcast (the whole point of the Bloom form vs the exact
    gram-shuffle twin)."""
    p = _plan(spark, sf_dir, "decontaminate_bloom")
    assert "BroadcastHashJoin" in p


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    """Additive decomposition must reconstruct: close = trend +
    seasonal + resid (within the 1e-6 output rounding), and the
    seasonal component must mean to ~0 within each (key,
    hour-of-day) group — the defining property of a fitted seasonal."""
    from zcode_iceberg_spark.suite import timeseries as tsx

    rows = (
        tsx.QUERIES["seasonal_decompose"].fn(spark, sf_dir).collect()
    )
    assert rows
    groups = {}
    for r in rows:
        assert abs(r.close - (r.trend + r.seasonal + r.resid)) < 3e-6, r
        hod = r.bar_ts[11:13]
        groups.setdefault((r.user_id, hod), []).append(r.resid)
    for k, resids in groups.items():
        assert abs(sum(resids) / len(resids)) < 1e-4, k


def test_attribution_partitions_all_purchases(spark, sf_dir):
    """Channels partition the purchase set: per-channel counts sum to
    the total purchase count, revenue to total purchase revenue, and
    only touch channels + 'direct' appear."""
    from zcode_iceberg_spark.sources.tables import events_ticks
    from zcode_iceberg_spark.suite import orderbook as ob
    import pyspark.sql.functions as F

    rows = (
        ob.QUERIES["attribution_last_touch"].fn(spark, sf_dir).collect()
    )
    assert {r.channel for r in rows} <= {"click", "view", "direct"}
    t = events_ticks(spark, sf_dir).filter(F.col("event_type") == "purchase")
    total = t.count()
    assert sum(r.n_purchases for r in rows) == total
    rev = t.agg(
        F.round(F.sum(F.expr("CAST(price AS DECIMAL(18,6))")).cast("double"), 4)
    ).collect()[0][0]
    assert abs(sum(r.revenue for r in rows) - rev) < 1e-3


def test_holt_matches_python_replay(spark, sf_dir):
    """Independent replay of the quantized-decimal Holt recursion in
    Python Decimal arithmetic must reproduce the engine's trajectory
    for every key — the cross-check that the algebra (not just the
    cross-engine agreement) is right."""
    from decimal import Decimal, ROUND_HALF_UP

    from zcode_iceberg_spark.suite import timeseries as tsx

    rows = tsx.QUERIES["holt_forecast"].fn(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    A, B = Decimal("0.5"), Decimal("0.3")
    ten = Decimal(1).scaleb(-10)
    checked = 0
    for u, rs in list(by_user.items())[:5]:
        rs.sort(key=lambda r: r.bar_ts)
        l = t = None
        for r in rs:
            x = Decimal(str(r.close))
            if l is None:
                l, t, fitted = x, Decimal(0), x
            else:
                fitted = l + t
                l2 = (A * x + (1 - A) * (l + t)).quantize(
                    ten, rounding=ROUND_HALF_UP
                )
                t = (B * (l2 - l) + (1 - B) * t).quantize(
                    ten, rounding=ROUND_HALF_UP
                )
                l = l2
            assert abs(float(l) - r.level) < 1e-6, (u, r.bar_ts)
            assert abs(float(t) - r.trend) < 1e-6
            assert abs(float(fitted) - r.fitted) < 1e-6
            checked += 1
    assert checked > 50


def test_timeseries_additions_plan_shapes(spark, sf_dir):
    """seasonal_decompose: one window family per key, no cartesian.
    attribution: the as-of union shape (no range explosion). holt:
    single fold, no joins beyond the bar groupBy."""
    import contextlib
    import io

    from zcode_iceberg_spark.suite import registry

    reg = registry()
    for name in ("seasonal_decompose", "holt_forecast", "attribution_last_touch"):
        df = reg[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_seasonal_anomaly_flags_extreme_residuals_only(spark, sf_dir):
    """Anomalies are exactly the rows whose |z| crosses the threshold,
    the z-scores standardize (per-key mean ≈ 0), and the flagged
    fraction is small (the detector runs on residuals, so daily rhythm
    and trend cannot masquerade as anomalies)."""
    from zcode_iceberg_spark.suite import timeseries as tsx

    rows = tsx.QUERIES["seasonal_anomaly"].fn(spark, sf_dir).collect()
    assert rows
    n_anom = sum(1 for r in rows if r.is_anomaly)
    assert 0 < n_anom < len(rows) * 0.05
    for r in rows:
        # the flag is computed on the UNROUNDED z; tolerate rows whose
        # rounded z sits within rounding distance of the threshold
        if abs(abs(r.resid_z) - tsx.ANOM_Z) > 1e-5:
            assert r.is_anomaly == (abs(r.resid_z) >= tsx.ANOM_Z), r
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.resid_z)
    for u, zs in by_user.items():
        assert abs(sum(zs) / len(zs)) < 1e-3, u
