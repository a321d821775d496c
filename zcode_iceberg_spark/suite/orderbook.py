"""Orderbook suite queries (SURVEY C1-C3, E1-E2, B5, D1, D2).

The events table stands in for the book: each valid tick is a level,
side from the taker flag, ``user_id`` = symbol key (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zcode_iceberg_spark.operators import asof as asof_ops
from zcode_iceberg_spark.operators import book as ops
from zcode_iceberg_spark.sources.tables import EVENTS_TICKS_SQL, events_ticks
from zcode_iceberg_spark.suite import Query

TICKS_CTE = f"WITH ticks AS ({EVENTS_TICKS_SQL})"

BOOK_CTE = """
book AS (
  SELECT user_id, event_id,
         CASE WHEN is_buy THEN 'bid' ELSE 'ask' END AS side,
         price, qty
  FROM ticks
)"""

RANKED_CTE = """
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, side
      ORDER BY CASE WHEN side = 'bid' THEN -price ELSE price END, event_id
    ) AS level
  FROM book
)"""


def _book(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.book_levels(events_ticks(spark, sf_dir))


def q_book_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+C2: price-priority top-20 depth slice per (key, side)."""
    top = ops.topk_levels(_book(spark, sf_dir), k=20)
    return top.select(
        "user_id",
        "side",
        "level",
        F.round("price", 6).alias("price"),
        F.round("qty", 6).alias("qty"),
    )


SQL_BOOK_TOPK = f"""
{TICKS_CTE},
{BOOK_CTE},
{RANKED_CTE}
SELECT user_id, side, level,
       round(price, 6) AS price, round(qty, 6) AS qty
FROM ranked WHERE level <= 20
"""


def q_best_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: best bid/ask (top-1 per ladder) + spread + mid per key."""
    q = ops.best_quotes(_book(spark, sf_dir))
    return q.select(
        "user_id",
        F.round("best_bid", 6).alias("best_bid"),
        F.round("best_ask", 6).alias("best_ask"),
        F.round("spread", 6).alias("spread"),
        F.round("mid", 6).alias("mid"),
    )


SQL_BEST_QUOTES = f"""
{TICKS_CTE},
{BOOK_CTE}
SELECT user_id,
       round(max(CASE WHEN side = 'bid' THEN price END), 6) AS best_bid,
       round(min(CASE WHEN side = 'ask' THEN price END), 6) AS best_ask,
       round(min(CASE WHEN side = 'ask' THEN price END)
             - max(CASE WHEN side = 'bid' THEN price END), 6) AS spread,
       round((min(CASE WHEN side = 'ask' THEN price END)
              + max(CASE WHEN side = 'bid' THEN price END)) / 2, 6) AS mid
FROM book GROUP BY user_id
"""


def q_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: depth-sum imbalance over top-20 per side, ±0.65 flags."""
    imb = ops.imbalance(_book(spark, sf_dir), k=20, threshold=0.65)
    return imb.select(
        "user_id",
        F.round("total_bid", 6).alias("total_bid"),
        F.round("total_ask", 6).alias("total_ask"),
        F.round("imbalance", 6).alias("imbalance"),
        "bid_heavy",
        "ask_heavy",
    )


SQL_IMBALANCE = f"""
{TICKS_CTE},
{BOOK_CTE},
{RANKED_CTE},
agg AS (
  SELECT user_id,
         coalesce(sum(CASE WHEN side = 'bid' THEN qty END), 0.0) AS total_bid,
         coalesce(sum(CASE WHEN side = 'ask' THEN qty END), 0.0) AS total_ask
  FROM ranked WHERE level <= 20 GROUP BY user_id
)
SELECT user_id,
       round(total_bid, 6) AS total_bid,
       round(total_ask, 6) AS total_ask,
       round(CASE WHEN total_bid + total_ask > 0
                  THEN (total_bid - total_ask) / (total_bid + total_ask)
                  ELSE 0.0 END, 6) AS imbalance,
       CASE WHEN total_bid + total_ask > 0
            THEN (total_bid - total_ask) / (total_bid + total_ask)
            ELSE 0.0 END >= 0.65 AS bid_heavy,
       CASE WHEN total_bid + total_ask > 0
            THEN (total_bid - total_ask) / (total_bid + total_ask)
            ELSE 0.0 END <= -0.65 AS ask_heavy
FROM agg
"""


def q_wall_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2+B5: zone-volume wall strength in a ±1% band around the mid."""
    w = ops.wall_strength(_book(spark, sf_dir), k=20, zone_pct=0.01, wall_mult=4.2)
    return w.select(
        "user_id",
        F.round("bid_zone_vol", 6).alias("bid_zone_vol"),
        F.round("ask_zone_vol", 6).alias("ask_zone_vol"),
        F.round("bid_wall_strength", 6).alias("bid_wall_strength"),
        F.round("ask_wall_strength", 6).alias("ask_wall_strength"),
        "bid_wall",
        "ask_wall",
    )


SQL_WALL_STRENGTH = f"""
{TICKS_CTE},
{BOOK_CTE},
{RANKED_CTE},
mids AS (
  SELECT user_id,
         (min(CASE WHEN side = 'ask' THEN price END)
          + max(CASE WHEN side = 'bid' THEN price END)) / 2 AS mid
  FROM book GROUP BY user_id
),
agg AS (
  SELECT r.user_id,
         coalesce(sum(CASE WHEN side = 'bid'
                        AND price BETWEEN mid * 0.99 AND mid * 1.01
                       THEN qty END), 0.0) AS bid_zone_vol,
         coalesce(sum(CASE WHEN side = 'ask'
                        AND price BETWEEN mid * 0.99 AND mid * 1.01
                       THEN qty END), 0.0) AS ask_zone_vol,
         coalesce(sum(CASE WHEN side = 'bid' THEN qty END), 0.0) AS total_bid,
         coalesce(sum(CASE WHEN side = 'ask' THEN qty END), 0.0) AS total_ask
  FROM ranked r JOIN mids USING (user_id)
  WHERE level <= 20
  GROUP BY r.user_id
)
SELECT user_id,
       round(bid_zone_vol, 6) AS bid_zone_vol,
       round(ask_zone_vol, 6) AS ask_zone_vol,
       round(CASE WHEN total_bid / 20 > 0 THEN bid_zone_vol / (total_bid / 20)
                  ELSE 0.0 END, 6) AS bid_wall_strength,
       round(CASE WHEN total_ask / 20 > 0 THEN ask_zone_vol / (total_ask / 20)
                  ELSE 0.0 END, 6) AS ask_wall_strength,
       CASE WHEN total_bid / 20 > 0 THEN bid_zone_vol / (total_bid / 20)
            ELSE 0.0 END >= 4.2 AS bid_wall,
       CASE WHEN total_ask / 20 > 0 THEN ask_zone_vol / (total_ask / 20)
            ELSE 0.0 END >= 4.2 AS ask_wall
FROM agg
"""


def q_asof_trade_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: as-of join — each trade (purchase event) picks up the latest
    quote (view event) at or before its timestamp, per key.

    Spark side: union + last(ignorenulls) over event-time window (one
    shuffle, no range explosion — operators/asof.py). Oracle: DuckDB's
    native ASOF LEFT JOIN.
    """
    t = events_ticks(spark, sf_dir)
    trades = t.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "price", "qty"
    )
    quotes = t.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "price"
    )
    j = asof_ops.asof_join(trades, quotes, key="user_id", value_cols=["price"])
    return j.select(
        "event_id",
        "user_id",
        F.round("price", 6).alias("price"),
        F.round("asof_price", 6).alias("asof_price"),
        F.round(F.col("price") - F.col("asof_price"), 6).alias("px_vs_quote"),
    )


SQL_ASOF_TRADE_QUOTE = f"""
{TICKS_CTE},
trades AS (
  SELECT event_id, user_id, ts, price, qty FROM ticks
  WHERE event_type = 'purchase'
),
quotes AS (
  SELECT user_id, ts, price AS quote_price FROM ticks
  WHERE event_type = 'view'
)
SELECT t.event_id, t.user_id,
       round(t.price, 6) AS price,
       round(q.quote_price, 6) AS asof_price,
       round(t.price - q.quote_price, 6) AS px_vs_quote
FROM trades t ASOF LEFT JOIN quotes q
  ON t.user_id = q.user_id AND t.ts >= q.ts
"""


def q_range_join_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: interval join — for each decision tick (purchase), aggregate
    ALL trades in its trailing 1-hour window on the same key, as an
    explicit range join (not a window frame)."""
    t = events_ticks(spark, sf_dir)
    decisions = t.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    trades = t.select("user_id", "ts", "qty", "is_buy")
    pairs = asof_ops.range_join(decisions, trades, key="user_id", lookback_sec=3600)
    return pairs.groupBy("event_id", "user_id").agg(
        F.coalesce(
            F.round(F.sum(F.when(F.col("r_is_buy"), F.col("r_qty"))), 6), F.lit(0.0)
        ).alias("buy_vol"),
        F.coalesce(
            F.round(F.sum(F.when(~F.col("r_is_buy"), F.col("r_qty"))), 6), F.lit(0.0)
        ).alias("sell_vol"),
        F.count("r_qty").cast("bigint").alias("n_trades"),
    )


SQL_RANGE_JOIN_FLOW = f"""
{TICKS_CTE},
decisions AS (
  SELECT event_id, user_id, ts FROM ticks WHERE event_type = 'purchase'
)
SELECT d.event_id, d.user_id,
       coalesce(round(sum(CASE WHEN t.is_buy THEN t.qty END), 6), 0.0) AS buy_vol,
       coalesce(round(sum(CASE WHEN NOT t.is_buy THEN t.qty END), 6), 0.0) AS sell_vol,
       count(t.qty) AS n_trades
FROM decisions d LEFT JOIN ticks t
  ON d.user_id = t.user_id
 AND t.ts <= d.ts AND t.ts >= d.ts - INTERVAL 3600 SECONDS
GROUP BY d.event_id, d.user_id
"""


def q_iceberg_refill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's namesake signal: hidden-("iceberg")-order detection
    by the refill signature — a price level whose visible quantity
    RISES again after trades ate it is being replenished from hidden
    size (the liquidity walls the reference's ZScoreIcebergHunter
    stalks via wall strength, strategy.py:966-998; this query makes
    the detection itself a first-class relational operator).

    Levels are bucketed to integer price (the stand-in for the
    instrument tick grid at real scale); per (key, side, level) the
    event sequence is lag-compared and refills (qty up-ticks) counted.
    Plan shape: ONE exchange on the level key serves both the lag
    window and the rollup (the groupBy keys are the window partition
    keys), and refill quantity totals use exact micro-units so the
    output is partition-independent."""
    from zcode_iceberg_spark.operators.stateful import micro

    t = events_ticks(spark, sf_dir)
    lv = ops.book_levels(t).withColumn(
        "lvl", F.floor("price").cast("bigint")
    )
    w = Window.partitionBy("user_id", "side", "lvl").orderBy("event_id")
    seq = lv.withColumn("prev_qty", F.lag("qty").over(w))
    delta = F.col("qty") - F.col("prev_qty")
    g = (
        seq.groupBy("user_id", "side", "lvl")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(delta > 0, 1).otherwise(0)).alias("n_refills"),
            (
                F.sum(
                    F.when(delta > 0, micro("qty - prev_qty")).otherwise(
                        F.lit(0).cast("bigint")
                    )
                )
                / 1e6
            ).alias("refill_qty"),
            F.round(F.max("qty"), 6).alias("max_qty"),
        )
        .filter(F.col("n_events") >= 3)
    )
    return g.select(
        "user_id",
        "side",
        "lvl",
        "n_events",
        "n_refills",
        "refill_qty",
        "max_qty",
        (F.col("n_refills") >= 2).alias("iceberg"),
    )


SQL_ICEBERG_REFILL = f"""
{TICKS_CTE},
lv AS (
  SELECT user_id,
         CASE WHEN is_buy THEN 'bid' ELSE 'ask' END AS side,
         CAST(floor(price) AS BIGINT) AS lvl,
         qty, event_id
  FROM ticks
),
seq AS (
  SELECT *, lag(qty) OVER (PARTITION BY user_id, side, lvl
                           ORDER BY event_id) AS prev_qty
  FROM lv
),
g AS (
  SELECT user_id, side, lvl,
         count(*) AS n_events,
         CAST(sum(CASE WHEN qty > prev_qty THEN 1 ELSE 0 END) AS BIGINT)
           AS n_refills,
         sum(CASE WHEN qty > prev_qty
                  THEN CAST(round((qty - prev_qty) * 1e6) AS BIGINT)
                  ELSE 0 END) / 1000000.0 AS refill_qty,
         round(max(qty), 6) AS max_qty
  FROM seq GROUP BY 1, 2, 3
)
SELECT user_id, side, lvl, n_events, n_refills, refill_qty, max_qty,
       (n_refills >= 2) AS iceberg
FROM g WHERE n_events >= 3
"""


# ------------------------------------------------------- depth slippage

SLIP_FRACS = [0.1, 0.25, 0.5]  # order sizes as fractions of side depth


def q_depth_slippage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-to-fill estimator: walk each (key, side) ladder in price
    priority, consuming levels until a target size is filled, for a
    ladder of order sizes ({SLIP_FRACS} of the side's total depth) —
    expected VWAP fill price, levels touched, and slippage in bps vs
    the best quote. The liquidity question behind the reference's
    wall/imbalance metrics ("what does it actually cost to trade
    size S here"), and the pre-trade check any execution desk runs.

    Scale shape: ONE window family per (key, side) — cumulative depth,
    side total, and best quote all ride the same price-priority sort
    (the liquidity_velocity discipline); the {len(SLIP_FRACS)}-size
    ladder is an explode AFTER the window pass (sizes share the one
    cumsum instead of re-sorting per size); the fill rollup is a hash
    agg whose per-level contribution is quantized to integer
    micro-units so the float sum is partition-order-free (the bm25
    rule). Buy orders walk asks up, sell orders walk bids down; both
    slippages are signed positive-away-from-best."""
    b = _book(spark, sf_dir)
    sort_key = F.when(F.col("side") == "bid", -F.col("price")).otherwise(
        F.col("price")
    )
    w = Window.partitionBy("user_id", "side").orderBy(sort_key, "event_id")
    wp = Window.partitionBy("user_id", "side")
    lv = (
        b.select("user_id", "side", "price", "qty", "event_id")
        .withColumn("cum", F.sum("qty").over(w))
        .withColumn("total", F.sum("qty").over(wp))
        .withColumn("best", F.first("price").over(w))
    )
    fr = lv.select(
        "*",
        F.explode(F.array(*[F.lit(x) for x in SLIP_FRACS])).alias("frac"),
    )
    t = F.col("frac") * F.col("total")
    consumed = fr.filter(F.col("cum") - F.col("qty") < t).withColumn(
        "fill_micro",
        F.round(
            F.col("price")
            * F.least(F.col("qty"), t - (F.col("cum") - F.col("qty")))
            * 1e6
        ).cast("bigint"),
    )
    agg = consumed.groupBy("user_id", "side", "frac").agg(
        F.sum("fill_micro").alias("fill_micro"),
        F.max(t).alias("target_qty"),
        F.max("best").alias("best_price"),
        F.count(F.lit(1)).alias("n_levels"),
    )
    vwap = F.col("fill_micro") / 1e6 / F.col("target_qty")
    slip = F.when(
        F.col("side") == "ask", (vwap / F.col("best_price") - 1) * 1e4
    ).otherwise((1 - vwap / F.col("best_price")) * 1e4)
    return agg.select(
        "user_id",
        "side",
        "frac",
        F.round("target_qty", 6).alias("target_qty"),
        "n_levels",
        F.round(vwap, 6).alias("vwap_fill"),
        F.round("best_price", 6).alias("best_price"),
        # + 0.0 folds IEEE −0.0 (a sub-half-ulp negative slippage
        # rounded to zero) onto +0.0 so the bit-compare can't split
        (F.round(slip, 6) + F.lit(0.0)).alias("slippage_bps"),
    )


_SLIP_T = "(frac * total)"
_SLIP_FILL = f"least(qty, {_SLIP_T} - (cum - qty))"

SQL_DEPTH_SLIPPAGE = f"""
{TICKS_CTE},
{BOOK_CTE},
lv AS (
  SELECT user_id, side, price, qty, event_id,
         sum(qty) OVER w AS cum,
         sum(qty) OVER (PARTITION BY user_id, side) AS total,
         first_value(price) OVER w AS best
  FROM book
  WINDOW w AS (PARTITION BY user_id, side
               ORDER BY CASE WHEN side = 'bid' THEN -price ELSE price END,
                        event_id)
),
fr AS (
  SELECT lv.*, unnest({SLIP_FRACS}) AS frac FROM lv
),
consumed AS (
  SELECT user_id, side, frac, best, {_SLIP_T} AS t,
         CAST(round(price * {_SLIP_FILL} * 1e6) AS BIGINT) AS fill_micro
  FROM fr WHERE cum - qty < {_SLIP_T}
),
agg AS (
  SELECT user_id, side, frac,
         CAST(sum(fill_micro) AS BIGINT) AS fill_micro,
         max(t) AS target_qty, max(best) AS best_price,
         count(*) AS n_levels
  FROM consumed GROUP BY user_id, side, frac
)
SELECT user_id, side, frac,
       round(target_qty, 6) AS target_qty,
       n_levels,
       round(fill_micro / 1e6 / target_qty, 6) AS vwap_fill,
       round(best_price, 6) AS best_price,
       round(CASE WHEN side = 'ask'
                  THEN (fill_micro / 1e6 / target_qty / best_price - 1) * 1e4
                  ELSE (1 - fill_micro / 1e6 / target_qty / best_price) * 1e4
             END, 6) + 0.0 AS slippage_bps
FROM agg
"""


ATTR_LOOKBACK_H = 24


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution archetype on the D1 as-of kernel: each
    purchase attributes to the LATEST click/view by the same user at
    or before it (union + last(ignorenulls) — one shuffle, no range
    explosion), demoted to the 'direct' channel when the touch is
    older than the {ATTR_LOOKBACK_H}h lookback or absent. Revenue
    rolls up per channel as an exact-decimal sum.

    Touches are pre-deduped to ONE row per (user_id, touch_ts) with an
    explicit deterministic winner (greatest event_id via max_by /
    arg_max) IN BOTH ENGINES before the as-of join — DuckDB's ASOF
    JOIN leaves equal-timestamp tie order unspecified, so without the
    pre-dedup a click and a view at the identical ts could flip
    channel between engines (ADVICE r9).

    Scale shape: the pre-dedup is a map-side-combinable hash agg; the
    as-of carry is the same single window family the trade/quote join
    uses; the rollup is a 3-row hash agg. Oracle: DuckDB's native
    ASOF LEFT JOIN + the same CASE."""
    t = events_ticks(spark, sf_dir)
    purchases = t.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "price"
    )
    touches = (
        t.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("event_type", "event_id").alias("touch_type"),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "touch_type",
            F.col("ts").alias("touch_ts"),
        )
    )
    j = asof_ops.asof_join(
        purchases, touches, key="user_id", value_cols=["touch_type", "touch_ts"]
    )
    channel = F.when(
        F.col("asof_touch_ts")
        >= F.col("ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_H} HOURS"),
        F.col("asof_touch_type"),
    ).otherwise(F.lit("direct"))
    return (
        j.select(channel.alias("channel"), "price")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.expr("CAST(price AS DECIMAL(18,6))")).cast("double"),
                6,
            ).alias("revenue"),
        )
    )


SQL_ATTRIBUTION_LAST_TOUCH = f"""
{TICKS_CTE},
purchases AS (
  SELECT event_id, user_id, ts, price FROM ticks
  WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts AS touch_ts,
         arg_max(event_type, event_id) AS touch_type
  FROM ticks
  WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
attributed AS (
  SELECT CASE WHEN q.touch_ts >= p.ts - INTERVAL {ATTR_LOOKBACK_H} HOURS
              THEN q.touch_type ELSE 'direct' END AS channel,
         p.price
  FROM purchases p ASOF LEFT JOIN touches q
    ON p.user_id = q.user_id AND p.ts >= q.touch_ts
)
SELECT channel, count(*) AS n_purchases,
       round(CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS revenue
FROM attributed GROUP BY channel
"""


QUERIES = {
    "attribution_last_touch": Query(
        q_attribution_last_touch, SQL_ATTRIBUTION_LAST_TOUCH
    ),
    "iceberg_refill": Query(q_iceberg_refill, SQL_ICEBERG_REFILL),
    "depth_slippage": Query(q_depth_slippage, SQL_DEPTH_SLIPPAGE),
    "book_topk": Query(q_book_topk, SQL_BOOK_TOPK),
    "best_quotes": Query(q_best_quotes, SQL_BEST_QUOTES),
    "imbalance": Query(q_imbalance, SQL_IMBALANCE),
    "wall_strength": Query(q_wall_strength, SQL_WALL_STRENGTH),
    "asof_trade_quote": Query(q_asof_trade_quote, SQL_ASOF_TRADE_QUOTE),
    "range_join_flow": Query(q_range_join_flow, SQL_RANGE_JOIN_FLOW),
}
