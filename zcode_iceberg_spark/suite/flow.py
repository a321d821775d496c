"""Order-flow suite queries (SURVEY E3-E6, B1-B3, G17)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "ticks_normalize": Query(q_ticks_normalize, SQL_TICKS_NORMALIZE),
    "sessionize": Query(q_sessionize, SQL_SESSIONIZE),
    "delta_zscore": Query(q_delta_zscore, SQL_DELTA_ZSCORE),
    "cvd": Query(q_cvd, SQL_CVD),
    "volume_factor": Query(q_volume_factor, SQL_VOLUME_FACTOR),
}
