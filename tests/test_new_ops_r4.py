"""Property tests for the late-round-4 operators: calendar-spine gap
fill, sketch-audited heavy hitters / HLL overlap, and BPE merge
learning. Value-level correctness is pinned by the DuckDB oracles in
tests/test_oracle_suite.py; these assert the structural invariants the
oracles can't phrase (spine density, sketch guarantees, symbol-mass
conservation across merge rounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zcode_iceberg_spark.operators import text as tx
from zcode_iceberg_spark.operators import timeseries as ts_ops
from zcode_iceberg_spark.sources.tables import events_ticks
from zcode_iceberg_spark.suite.llm import _bpe_words


def test_gap_fill_spine_density(spark, sf_dir):
    """Per key: one row per hour between min and max bar (inclusive),
    non-gap rows exactly the original bars, close_ff never null (the
    first spine row is a real bar by construction), zeroed volume on
    synthesized rows."""
    bars = ts_ops.ohlc_bars(events_ticks(spark, sf_dir), minutes=60)
    filled = ts_ops.gap_fill(bars, minutes=60)

    per_key = (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(~F.col("is_gap"), 1).otherwise(0)).alias("n_bars"),
            (
                (F.unix_timestamp(F.max("bar_ts")) - F.unix_timestamp(F.min("bar_ts")))
                / 3600
                + 1
            ).alias("expect_rows"),
            F.sum(F.when(F.col("close_ff").isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(F.col("is_gap") & (F.col("volume") != 0.0), 1).otherwise(0))
            .alias("n_gap_vol"),
        )
        .collect()
    )
    bar_counts = {
        r["user_id"]: r["n"]
        for r in bars.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_key, "no keys"
    for r in per_key:
        assert r["n_rows"] == int(r["expect_rows"]), r
        assert r["n_bars"] == bar_counts[r["user_id"]], r
        assert r["n_null"] == 0, r
        assert r["n_gap_vol"] == 0, r


def test_bpe_symbol_mass_conservation(spark, sf_dir):
    """Each merge round shrinks the freq-weighted symbol mass by at
    least one per merged occurrence and by at most the round's pair
    count (greedy left-to-right merging collapses overlapping pairs,
    so the realized merge count is in (0, pair_count])."""
    words = _bpe_words(spark, sf_dir).localCheckpoint()
    merges, seg = tx.bpe_learn(words, 3)
    assert merges, "no merges learned"
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))

    def mass(df):
        return df.select(
            F.sum(F.col("freq") * F.size("syms")).alias("m")
        ).first()["m"]

    cur = words.select(
        "word", F.col("freq").cast("bigint").alias("freq"),
        tx.chars(F.col("word")).alias("syms"),
    )
    prev_mass = mass(cur)
    for rnd, l, r, c in merges:
        cur = cur.withColumn("syms", tx.apply_merge(F.col("syms"), l, r))
        new_mass = mass(cur)
        drop = prev_mass - new_mass
        assert 0 < drop <= c, (rnd, l, r, c, drop)
        prev_mass = new_mass
    # final segmentation from bpe_learn agrees with the replayed folds
    lhs = cur.select("word", F.array_join("syms", " ").alias("s"))
    rhs = seg.select("word", F.array_join("syms", " ").alias("s"))
    assert lhs.exceptAll(rhs).count() == 0
    assert rhs.exceptAll(lhs).count() == 0


def test_apply_merge_greedy_overlap(spark):
    """'aaa' under merge (a,a) → ['aa','a'] — leftmost-greedy, no
    re-merge of the merged symbol within the pass."""
    df = spark.createDataFrame([(["a", "a", "a"],), (["a"],), ([],)], "syms: array<string>")
    out = [r["m"] for r in df.select(
        tx.apply_merge(F.col("syms"), "a", "a").alias("m")
    ).collect()]
    assert out == [["aa", "a"], ["a"], []]


def test_heavy_hitters_guarantee(spark, sf_dir):
    """Every reported token clears the frequency bar AND the sketch's
    no-false-negative guarantee (sketch_ok) holds for all rows."""
    from zcode_iceberg_spark.suite.llm import q_heavy_hitters, HH_MIN_FRAC

    rows = q_heavy_hitters(spark, sf_dir).collect()
    assert rows, "no heavy hitters at this scale"
    assert all(r["sketch_ok"] for r in rows)
    total_share = sum(r["share"] for r in rows)
    assert 0 < total_share <= 1.0 + 1e-6
    assert all(r["share"] >= HH_MIN_FRAC - 1e-9 for r in rows)


def test_hll_overlap_flags(spark, sf_dir):
    from zcode_iceberg_spark.suite.llm import q_decon_overlap_hll

    r = q_decon_overlap_hll(spark, sf_dir).first()
    assert r["hll_train_ok"] and r["hll_test_ok"] and r["hll_overlap_ok"]
    assert 0 <= r["n_both"] <= min(r["n_train"], r["n_test"])


def test_pagerank_mass_conservation(spark, sf_dir):
    """With a symmetric (dangling-free) graph, total rank mass stays 1
    per iteration (up to the 1e-12 contribution quantization), so mean
    centrality is 1; every vertex holds at least the damping floor."""
    from zcode_iceberg_spark.suite.llm import q_pagerank

    rows = q_pagerank(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    mean_c = sum(r["centrality"] for r in rows) / n
    assert abs(mean_c - 1.0) < 1e-4
    assert all(r["centrality"] >= 0.15 - 1e-6 for r in rows)  # (1-d) floor
    assert all(r["deg"] >= 1 for r in rows)


def _py_greedy_merge(syms, l, r):
    out = []
    for x in syms:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


def test_apply_merge_randomized_against_reference(spark):
    """200 random symbol arrays: the Spark expression fold equals a
    plain-Python greedy merge on every case (one vectorized round
    trip, fixed seed)."""
    import random

    rng = random.Random(42)
    alphabet = ["a", "b", "c", "ab"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i: long, syms: array<string>")
    got = {
        r["i"]: r["m"]
        for r in df.select("i", tx.apply_merge(F.col("syms"), "a", "b").alias("m"))
        .collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _py_greedy_merge(c, "a", "b"), (i, c)


def test_funnel_step_randomized_against_reference():
    """300 random event sequences: the streaming fold lands every user
    at the same stage as a brute-force scan of the same ordered
    sequence, for any chunking of the input."""
    import random

    import pandas as pd

    from zcode_iceberg_spark.streaming import funnel_step

    rng = random.Random(7)
    W = 100
    types = ["view", "click", "purchase", "error"]
    for case in range(300):
        n = rng.randint(0, 15)
        evs = sorted(
            (rng.randint(0, 400), i, rng.choice(types)) for i, _ in enumerate(range(n))
        )
        # brute force: first view; first click strictly after within W;
        # first purchase strictly after that within W
        t1 = t2 = t3 = -1
        for us, _, typ in evs:
            if typ == "view" and t1 < 0:
                t1 = us
            elif typ == "click" and t1 >= 0 and t2 < 0 and t1 < us <= t1 + W:
                t2 = us
            elif typ == "purchase" and t2 >= 0 and t3 < 0 and t2 < us <= t2 + W:
                t3 = us
        want = 3 if t3 >= 0 else 2 if t2 >= 0 else 1 if t1 >= 0 else 0

        pdf = pd.DataFrame(
            {
                "event_type": [t for _, _, t in evs],
                "ts_us": [u for u, _, _ in evs],
                "event_id": [i for _, i, _ in evs],
            }
        )
        cut = rng.randint(0, len(pdf)) if len(pdf) else 0
        r1, st = funnel_step((1,), [pdf.iloc[:cut]], None, window_us=W)
        r2, _ = funnel_step((1,), [pdf.iloc[cut:]], st, window_us=W)
        assert r2["stage_reached"] == want, (case, evs, r2, want)


def test_dsir_target_outscored_on_average(spark, sf_dir):
    """DSIR semantic invariant (beyond the hash oracle): documents
    drawn from the target distribution (lang=en) must out-score
    non-target documents ON AVERAGE — the whole point of the
    importance ratio — and every score must be a finite integer-sum
    with keep == (score > 0)."""
    from zcode_iceberg_spark.suite.llm import DSIR_TARGET_LANG, q_dsir_select

    rows = q_dsir_select(spark, sf_dir).collect()
    assert rows
    tgt = [r["score_micro"] for r in rows if r["lang"] == DSIR_TARGET_LANG]
    oth = [r["score_micro"] for r in rows if r["lang"] != DSIR_TARGET_LANG]
    assert tgt and oth
    assert sum(tgt) / len(tgt) > sum(oth) / len(oth)
    for r in rows:
        assert r["keep"] == (r["score_micro"] > 0)
        assert r["n_grams"] > 0
