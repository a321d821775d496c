"""As-of and range (interval) joins — SURVEY.md D1, D2.

Spark SQL has no native as-of join. The reference does it implicitly:
each decision tick reads "the latest" orderbook snapshot and a trailing
10 s trade slice (reference strategy.py:339,371-378,1002).

Two scalable formulations:

1. :func:`asof_join` — union + ``last(ignorenulls)`` over an event-time
   window. ONE shuffle on the join key, one sort by (ts, src); no
   cross/range explosion. State per key is a single row of carried
   right-side values, so it holds at any history length — this is the
   canonical big-data as-of (same trick Flink's temporal join and
   QuestDB/kdb ASOF use logically).

2. :func:`range_join` — an explicit interval join for bounded lookback
   windows. Spark executes it as a broadcast-range or sort-merge-range
   join; AQE handles skew. Use when EVERY right row in the interval is
   needed (e.g. summing trades in [ts−10s, ts]), where as-of's
   "latest only" is insufficient.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    value_cols: Sequence[str],
    ts: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same key (D1).

    At equal timestamps the right row wins (<= semantics, matching
    DuckDB's ASOF JOIN oracle); among right rows tied on ts the one
    with the greatest tiebreak wins — fully deterministic.

    Left columns pass through; right value columns arrive as
    ``asof_<col>`` (NULL when no prior right row exists).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"asof_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.col(c) if c in (key, ts, order_tiebreak) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"asof_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    # right rows (src=0) sort before left rows at the same ts → "<=".
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__src", order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumns(
        {f"asof_{c}": F.last(f"asof_{c}", ignorenulls=True).over(w) for c in value_cols}
    )
    return filled.filter(F.col("__src") == 1).drop("__src")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lookback_sec: float,
    ts: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Pair each left row with ALL right rows in
    ``[left.ts − lookback, left.ts]`` on the same key (D2; reference
    pairs each decision with its trailing 10 s of trades,
    strategy.py:1002, config.py:67).

    Emitted as an explicit join so Catalyst can pick a range-join
    strategy; callers aggregate the pairs (the unaggregated form is a
    fan-out — keep lookback bounded at scale).
    """
    r = right.select(
        F.col(key).alias(f"{right_prefix}{key}"),
        F.col(ts).alias(f"{right_prefix}{ts}"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in (key, ts)
        ],
    )
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col(f"{right_prefix}{ts}") <= F.col(ts))
        & (
            F.col(f"{right_prefix}{ts}")
            >= F.col(ts) - F.expr(f"INTERVAL {lookback_sec} SECONDS")
        )
    )
    return left.join(r, cond, "left")
