"""Order-flow suite queries (SURVEY E3-E6, B1-B3, G17)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zcode_iceberg_spark.operators import flow as ops
from zcode_iceberg_spark.sources.tables import EVENTS_TICKS_SQL, events_ticks
from zcode_iceberg_spark.suite import Query

TICKS_CTE = f"WITH ticks AS ({EVENTS_TICKS_SQL})"


def q_ticks_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-B3 + G17: ingest normalization — JSON payload extraction,
    validity filter, side labeling, epoch→event-time conversion."""
    t = events_ticks(spark, sf_dir)
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        F.round("price", 6).alias("price"),
        F.round("qty", 6).alias("qty"),
        "is_buy",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


SQL_TICKS_NORMALIZE = f"""
{TICKS_CTE}
SELECT event_id, user_id, event_type,
       round(price, 6) AS price,
       round(qty, 6) AS qty,
       is_buy,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM ticks
"""


def q_delta_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+E4: taker-delta over trailing 600 s + z-score vs trailing
    50-row population (population std, min 30 obs) — the reference's
    namesake metric (strategy.py:1000-1043)."""
    t = events_ticks(spark, sf_dir)
    z = ops.delta_zscore(t, window_sec=600, pop_rows=50, min_pop=30)
    return z.select(
        "event_id",
        "user_id",
        F.round("delta", 6).alias("delta"),
        F.round("z", 6).alias("z"),
    )


SQL_DELTA_ZSCORE = f"""
{TICKS_CTE},
d AS (
  SELECT event_id, user_id, ts,
         SUM(CASE WHEN is_buy THEN qty ELSE 0.0 END) OVER w
           - SUM(CASE WHEN NOT is_buy THEN qty ELSE 0.0 END) OVER w AS delta
  FROM ticks
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
),
p AS (
  SELECT event_id, user_id, delta,
         avg(delta) OVER wp AS mu,
         stddev_pop(delta) OVER wp AS sigma,
         count(delta) OVER wp AS n
  FROM d
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, round(delta, 6) AS delta,
       CASE WHEN n >= 30 AND sigma > 0
            THEN round((delta - mu) / sigma, 6) ELSE 0.0 END AS z
FROM p
"""


def q_cvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: normalized cumulative volume delta, clamped [-1, 1]."""
    t = events_ticks(spark, sf_dir)
    c = ops.cvd(t, window_sec=3600)
    return c.select("event_id", "user_id", F.round("cvd", 6).alias("cvd"))


SQL_CVD = f"""
{TICKS_CTE},
d AS (
  SELECT event_id, user_id,
         SUM(CASE WHEN is_buy THEN qty ELSE 0.0 END) OVER w AS buy_vol,
         SUM(CASE WHEN NOT is_buy THEN qty ELSE 0.0 END) OVER w AS sell_vol
  FROM ticks
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CASE WHEN buy_vol + sell_vol > 0
            THEN round(least(greatest((buy_vol - sell_vol) / (buy_vol + sell_vol),
                                      -1.0), 1.0), 6)
            ELSE 0.0 END AS cvd
FROM d
"""


def q_volume_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: recent-vs-baseline volume-rate ratio, clamped [0.5, 2]."""
    t = events_ticks(spark, sf_dir)
    v = ops.volume_factor(t, recent_sec=3600, baseline_sec=86400)
    return v.select("event_id", "user_id", F.round("vol_factor", 6).alias("vol_factor"))


SQL_VOLUME_FACTOR = f"""
{TICKS_CTE},
d AS (
  SELECT event_id, user_id,
         SUM(qty) OVER wr / 3600.0 AS recent_rate,
         SUM(qty) OVER wb / 86400.0 AS base_rate
  FROM ticks
  WINDOW wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
         wb AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CASE WHEN base_rate > 0
            THEN round(least(greatest(recent_rate / base_rate, 0.5), 2.0), 6)
            ELSE 1.0 END AS vol_factor
FROM d
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1/H9 analog: 30-minute-gap session windows per key
    (``session_window`` — one shuffle on the key; watermark-bounded
    state in streaming mode)."""
    s = ops.sessionize(events_ticks(spark, sf_dir), gap="30 minutes")
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("volume", 6).alias("volume"),
        F.round("buy_volume", 6).alias("buy_volume"),
    )


# gaps-and-islands twin of session_window: a new session starts where
# the gap from the previous event exceeds 30 min; session_end is the
# LAST event (Spark's window.end minus the gap).
SQL_SESSIONIZE = f"""
{TICKS_CTE},
marks AS (
  SELECT user_id, ts, event_id, qty, is_buy,
         -- Spark merges event windows [ts, ts+gap) on OVERLAP, so an
         -- exactly-gap-sized silence starts a NEW session → split on >=
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM ticks
),
sess AS (
  SELECT *,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(sum(qty), 6) AS volume,
       round(sum(CASE WHEN is_buy THEN qty ELSE 0.0 END), 6) AS buy_volume
FROM sess GROUP BY user_id, sid
"""


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 extension: trailing sample correlation/covariance between
    price and traded qty per user over the last 50 ticks — one window
    family on the same (user, ts) sort every trailing stat uses.

    Float determinism: NEITHER builtin corr()/covar_samp() NOR plain
    windowed sums are bit-identical between Spark and DuckDB here
    (different co-moment algorithms / segment-tree summation — ulp
    diffs that flip round(6) on ~0.03% of rows). So the frame values
    are collected in frame order and folded LEFT-TO-RIGHT with
    F.aggregate ↔ list_reduce — sequential double folds are the one
    accumulation both engines execute identically (same trick as the
    EMA/cosine oracles). Null where the frame lacks variance."""
    t = events_ticks(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, 0)
    )
    lx = F.collect_list("price").over(w)
    ly = F.collect_list("qty").over(w)
    pre = t.select(
        "event_id", "user_id", lx.alias("lx"), ly.alias("ly")
    )

    def fold(arr, f):
        return F.aggregate(arr, F.lit(0.0), f)

    n = F.size("lx").cast("bigint")
    sx = fold(F.col("lx"), lambda a, x: a + x)
    sy = fold(F.col("ly"), lambda a, x: a + x)
    sxx = fold(F.col("lx"), lambda a, x: a + x * x)
    syy = fold(F.col("ly"), lambda a, x: a + x * x)
    sxy = fold(
        F.zip_with(F.col("lx"), F.col("ly"), lambda a, b: a * b),
        lambda a, x: a + x,
    )
    sums = pre.select(
        "event_id",
        "user_id",
        n.alias("n"),
        sx.alias("sx"),
        sy.alias("sy"),
        sxx.alias("sxx"),
        syy.alias("syy"),
        sxy.alias("sxy"),
    )
    com = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    cov = F.when(F.col("n") > 1, com / (F.col("n") - 1))
    corr = F.when((F.col("n") > 1) & (vx > 0) & (vy > 0), com / F.sqrt(vx * vy))
    return sums.select(
        "event_id",
        "user_id",
        F.round(corr, 6).alias("corr_50"),
        F.round(cov, 6).alias("cov_50"),
        F.col("n").alias("n_win"),
    )


_FOLD_SUM = "list_reduce(list_prepend(0.0, {arr}), (a, x) -> a + x)"
_FOLD_SQ = "list_reduce(list_prepend(0.0, {arr}), (a, x) -> a + x * x)"

SQL_ROLLING_CORR = f"""
{TICKS_CTE},
lists AS (
  SELECT event_id, user_id,
         list(price) OVER w AS lx, list(qty) OVER w AS ly
  FROM ticks
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
),
sums AS (
  SELECT event_id, user_id, CAST(len(lx) AS BIGINT) AS n,
         {_FOLD_SUM.format(arr='lx')} AS sx,
         {_FOLD_SUM.format(arr='ly')} AS sy,
         {_FOLD_SQ.format(arr='lx')} AS sxx,
         {_FOLD_SQ.format(arr='ly')} AS syy,
         {_FOLD_SUM.format(arr="list_transform(generate_series(1, len(lx)), i -> lx[i] * ly[i])")} AS sxy
  FROM lists
)
SELECT event_id, user_id,
       round(CASE WHEN n > 1 AND (sxx - sx * sx / n) > 0
                   AND (syy - sy * sy / n) > 0
             THEN (sxy - sx * sy / n)
                  / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) END,
             6) AS corr_50,
       round(CASE WHEN n > 1 THEN (sxy - sx * sy / n) / (n - 1) END, 6)
         AS cov_50,
       n AS n_win
FROM sums
"""


QUERIES = {
    "ticks_normalize": Query(q_ticks_normalize, SQL_TICKS_NORMALIZE),
    "sessionize": Query(q_sessionize, SQL_SESSIONIZE),
    "delta_zscore": Query(q_delta_zscore, SQL_DELTA_ZSCORE),
    "cvd": Query(q_cvd, SQL_CVD),
    "volume_factor": Query(q_volume_factor, SQL_VOLUME_FACTOR),
    "rolling_corr": Query(q_rolling_corr, SQL_ROLLING_CORR),
}
