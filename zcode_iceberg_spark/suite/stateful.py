"""Stateful suite (SURVEY G16, H6, E13): hysteresis, position FSM,
ledger daily summary.

The hysteresis fold runs as ``applyInPandas`` yet still gets a full
SQL oracle: k-confirmation hysteresis is equivalent to gaps-and-islands
— a label is "confirmed" at the k-th row of a consecutive run, and the
active label at any row is the most recent confirmation event (proof
sketch in the oracle SQL comments). The FSM ledger is price-path
dependent (genuinely non-SQL) → rows-only driver check + property
tests in tests/test_stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zcode_iceberg_spark.operators import flow as flow_ops
from zcode_iceberg_spark.operators import stateful as st
from zcode_iceberg_spark.sources.tables import EVENTS_TICKS_SQL, events_ticks
from zcode_iceberg_spark.suite import Query

TICKS_CTE = f"WITH ticks AS ({EVENTS_TICKS_SQL})"

CONFIRM_K = 2
Z_UP, Z_DN = 1.0, -1.0


def _decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stream: delta z-score per tick (flow ops) + raw trend
    label from z thresholds."""
    t = events_ticks(spark, sf_dir)
    z = flow_ops.delta_zscore(t, window_sec=600, pop_rows=50, min_pop=30)
    return z.select(
        "user_id",
        "ts",
        "event_id",
        "price",
        "z",
        F.when(F.col("z") > Z_UP, "UP")
        .when(F.col("z") < Z_DN, "DOWN")
        .otherwise("RANGE")
        .alias("raw_label"),
    )


def q_trend_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G16: k-confirmation trend flips over the z-label stream —
    applyInPandas ordered fold per key."""
    d = _decisions(spark, sf_dir)
    h = st.hysteresis(d, label_col="raw_label", confirm_k=CONFIRM_K)
    return h.select(
        "user_id", "event_id", "raw_label", "confirmed_label", "pending_count"
    )


# Oracle: gaps-and-islands equivalence of the hysteresis fold.
# A run = maximal streak of identical raw labels per key. The fold
# confirms a label exactly at run-position k (count reaches k), and
# the active label at row i is the latest confirmation event <= i
# (initial RANGE). pending_count = run position while the run's label
# differs from the active label, else 0 (positions >= k can't differ:
# position k flips the active label to the run's own).
SQL_TREND_HYSTERESIS = f"""
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
  SELECT event_id, user_id, ts, delta,
         avg(delta) OVER wp AS mu,
         stddev_pop(delta) OVER wp AS sigma,
         count(delta) OVER wp AS n
  FROM d
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
),
lab AS (
  SELECT event_id, user_id, ts,
         CASE WHEN (CASE WHEN n >= 30 AND sigma > 0
                         THEN (delta - mu) / sigma ELSE 0.0 END) > {Z_UP}
              THEN 'UP'
              WHEN (CASE WHEN n >= 30 AND sigma > 0
                         THEN (delta - mu) / sigma ELSE 0.0 END) < {Z_DN}
              THEN 'DOWN'
              ELSE 'RANGE' END AS raw_label
  FROM p
),
edges AS (
  SELECT *,
         CASE WHEN raw_label IS DISTINCT FROM
                   lag(raw_label) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS is_new
  FROM lab
),
runs AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rid
  FROM edges
),
pos AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, rid
                            ORDER BY ts, event_id) AS run_pos
  FROM runs
),
conf AS (
  SELECT *,
         coalesce(
           last_value(CASE WHEN run_pos = {CONFIRM_K} THEN raw_label END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           'RANGE') AS confirmed_label
  FROM pos
)
SELECT user_id, event_id, raw_label, confirmed_label,
       CAST(CASE WHEN raw_label = confirmed_label THEN 0
                 ELSE run_pos END AS INTEGER) AS pending_count
FROM conf
"""


def q_position_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: position lifecycle FSM → closed-trade ledger. Price-path
    dependent ordered fold — no SQL oracle (driver rows-only check;
    invariants in tests/test_stateful.py)."""
    led = st.position_fsm(_decisions(spark, sf_dir))
    return led.select(
        "user_id",
        "trade_seq",
        F.format_string("ZS%04d", F.col("trade_seq")).alias("trade_id"),
        "side",
        F.date_format("entry_ts", "yyyy-MM-dd HH:mm:ss").alias("entry_ts"),
        F.date_format("exit_ts", "yyyy-MM-dd HH:mm:ss").alias("exit_ts"),
        F.round("entry_price", 6).alias("entry_price"),
        F.round("exit_price", 6).alias("exit_price"),
        F.round("qty", 6).alias("qty"),
        F.round("pnl", 6).alias("pnl"),
        F.round("roi", 6).alias("roi"),
        "exit_reason",
        F.round("hold_secs", 6).alias("hold_secs"),
    )


def q_ledger_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 over the FSM ledger: daily win/loss/profit-factor rollup
    (rows-only: input is the non-SQL FSM output)."""
    led = st.position_fsm(_decisions(spark, sf_dir))
    return st.ledger_daily_summary(led)


def q_ledger_exit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: outcome-rate stats per exit reason over the FSM ledger
    (reference order_manager.py:444-466 success-rate counters) —
    rows-only check, FSM input is non-SQL."""
    led = st.position_fsm(_decisions(spark, sf_dir))
    n_total = F.sum("n").over(Window.partitionBy())
    g = led.groupBy("exit_reason").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("pnl"), 6).alias("avg_pnl"),
        F.round(F.avg("hold_secs"), 6).alias("avg_hold_secs"),
        F.round(
            F.sum(F.when(F.col("pnl") > 0, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("win_rate"),
    )
    return g.withColumn("share", F.round(F.col("n") / n_total, 6))


QUERIES = {
    "trend_hysteresis": Query(q_trend_hysteresis, SQL_TREND_HYSTERESIS),
    "position_ledger": Query(q_position_ledger, None),
    "ledger_daily_summary": Query(q_ledger_daily_summary, None),
    "ledger_exit_stats": Query(q_ledger_exit_stats, None),
}
