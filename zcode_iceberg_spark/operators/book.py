"""Orderbook relational operators (SURVEY.md C1-C3, E1-E2, B5).

The reference keeps two sorted price ladders per symbol and derives,
per decision tick: top-20 depth slices, best bid/ask, depth-sum
imbalance with ±0.65 flags, and zone ("wall") volume strength in a
price band around the touch (reference: data_manager.py:484-488 sort,
strategy.py:939-998 imbalance + wall, config.py:63-70 band/threshold
constants).

Here the book is a DataFrame ``(user_id, side, price, qty, event_id)``
— ``user_id`` plays the symbol key. All operators are pure built-in
expressions:

- top-k per (key, side) is ``row_number`` over one window whose sort
  key flips sign for bids, so both sides rank in ONE window operator
  (one shuffle by key, one sort) instead of two;
- imbalance/wall are conditional-sum hash aggregates — partial
  (map-side) aggregation applies, so at 100 TB the shuffle carries one
  row per (key, side), not per level;
- the zone filter is a range predicate evaluated pre-aggregation, so
  Catalyst pushes it below the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = "user_id"


def book_levels(ticks: DataFrame) -> DataFrame:
    """Normalize a tick stream into book levels: side from the taker
    flag (bid=buy interest), price/qty carried through (C1 input)."""
    return ticks.select(
        KEY,
        "event_id",
        F.when(F.col("is_buy"), F.lit("bid")).otherwise(F.lit("ask")).alias("side"),
        "price",
        "qty",
    )


def _rank_in_side() -> F.Column:
    """Price-priority rank within (key, side): bids best=highest price,
    asks best=lowest — one window, sign-flipped sort key (C1+C2;
    reference sorts bids desc / asks asc, data_manager.py:484-485).
    Tie-break on event_id for determinism."""
    sort_key = F.when(F.col("side") == "bid", -F.col("price")).otherwise(F.col("price"))
    w = Window.partitionBy(KEY, "side").orderBy(sort_key, "event_id")
    return F.row_number().over(w)


def topk_levels(book: DataFrame, k: int = 20) -> DataFrame:
    """Top-K depth slice per (key, side) — C2, WALL_DEPTH_LEVELS=20
    (reference strategy.py:945-946)."""
    return book.withColumn("level", _rank_in_side()).filter(F.col("level") <= k)


def best_quotes(book: DataFrame) -> DataFrame:
    """Best bid/ask + spread + mid per key (C3, top-1 of each ladder;
    reference strategy.py:1052-1053). Plain min/max conditional aggs —
    no sort needed, unlike the generic top-k."""
    agg = book.groupBy(KEY).agg(
        F.max(F.when(F.col("side") == "bid", F.col("price"))).alias("best_bid"),
        F.min(F.when(F.col("side") == "ask", F.col("price"))).alias("best_ask"),
    )
    return agg.withColumns(
        {
            "spread": F.col("best_ask") - F.col("best_bid"),
            "mid": (F.col("best_ask") + F.col("best_bid")) / 2,
        }
    )


def imbalance(book: DataFrame, k: int = 20, threshold: float = 0.65) -> DataFrame:
    """Depth-sum imbalance over the top-K levels per side (E1).

    ``imb = (Σbid_qty − Σask_qty) / (Σbid + Σask)``, with ±threshold
    flags (reference strategy.py:939-964, IMBALANCE_THRESHOLD=0.65).
    Zero-depth guard → imb=0 (reference returns neutral on empty book).
    """
    top = topk_levels(book, k)
    agg = top.groupBy(KEY).agg(
        F.coalesce(
            F.sum(F.when(F.col("side") == "bid", F.col("qty"))), F.lit(0.0)
        ).alias("total_bid"),
        F.coalesce(
            F.sum(F.when(F.col("side") == "ask", F.col("qty"))), F.lit(0.0)
        ).alias("total_ask"),
    )
    total = F.col("total_bid") + F.col("total_ask")
    imb = F.when(total > 0, (F.col("total_bid") - F.col("total_ask")) / total).otherwise(
        F.lit(0.0)
    )
    return agg.withColumns(
        {
            "imbalance": imb,
            "bid_heavy": imb >= threshold,
            "ask_heavy": imb <= -threshold,
        }
    )


def wall_strength(
    book: DataFrame,
    k: int = 20,
    zone_pct: float = 0.01,
    wall_mult: float = 4.2,
) -> DataFrame:
    """Zone-volume wall strength in a price band around the mid (E2+B5).

    ``strength_side = Σqty(side, price ∈ mid·(1±zone_pct)) / (Σqty(side)/k)``
    — i.e. zone volume vs the average per-level volume; a "wall" flag
    fires when strength ≥ wall_mult (reference strategy.py:966-998:
    zone = price ± ZONE_TICKS·tick, avg = total/20, mult 4.2/3.8).

    Single pass: the band predicate and both conditional sums evaluate
    in one hash aggregate after a broadcast join of the per-key mid
    (best_quotes output is one row per key — broadcast-sized even at
    millions of keys relative to the level table).
    """
    top = topk_levels(book, k)
    quotes = best_quotes(book).select(KEY, "mid")
    lo = F.col("mid") * (1 - zone_pct)
    hi = F.col("mid") * (1 + zone_pct)
    joined = top.join(F.broadcast(quotes), KEY)
    in_zone = F.col("price").between(lo, hi)
    agg = joined.groupBy(KEY).agg(
        F.coalesce(
            F.sum(F.when((F.col("side") == "bid") & in_zone, F.col("qty"))), F.lit(0.0)
        ).alias("bid_zone_vol"),
        F.coalesce(
            F.sum(F.when((F.col("side") == "ask") & in_zone, F.col("qty"))), F.lit(0.0)
        ).alias("ask_zone_vol"),
        F.coalesce(
            F.sum(F.when(F.col("side") == "bid", F.col("qty"))), F.lit(0.0)
        ).alias("total_bid"),
        F.coalesce(
            F.sum(F.when(F.col("side") == "ask", F.col("qty"))), F.lit(0.0)
        ).alias("total_ask"),
    )
    bid_avg = F.col("total_bid") / k
    ask_avg = F.col("total_ask") / k
    bid_strength = F.when(bid_avg > 0, F.col("bid_zone_vol") / bid_avg).otherwise(
        F.lit(0.0)
    )
    ask_strength = F.when(ask_avg > 0, F.col("ask_zone_vol") / ask_avg).otherwise(
        F.lit(0.0)
    )
    return agg.withColumns(
        {
            "bid_wall_strength": bid_strength,
            "ask_wall_strength": ask_strength,
            "bid_wall": bid_strength >= wall_mult,
            "ask_wall": ask_strength >= wall_mult,
        }
    )
