"""Join strategy operators for the 100 TB layout (SURVEY D5, §4).

The reference has no relational joins (its joins are temporal
alignments, operators/asof.py); these are the strategies the ENGINE
needs when the same queries run against warehouse-scale tables:

- ``broadcast_dim_join`` — dimensions ship to every executor; the
  fact side is never shuffled for the join. This is the only sane
  plan for star joins at 100 TB (shuffling the fact table on a dim
  key would move the whole dataset).
- ``salted_join`` — skew mitigation when one join key dominates
  (AQE's skew-join split handles sort-merge skew automatically, but
  salting is the explicit, planner-independent form and works for
  aggregations too via two-phase ``salted_agg``).
- ``bucketed_write`` / co-located reads — pre-shuffling a table ONCE
  at write time so every subsequent join/agg on the bucket key runs
  with NO exchange. At 100 TB this converts the recurring per-query
  shuffle of a fact-fact join into a one-time write cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Star join with an explicit broadcast hint on the dimension.

    Catalyst auto-broadcasts under ``autoBroadcastJoinThreshold``
    (10 MB default) from size ESTIMATES; the hint makes the choice
    deliberate for dims known small (region/nation/date dims), immune
    to stats staleness at scale."""
    return fact.join(F.broadcast(dim), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted.

    Left rows get a deterministic salt in [0, n_salt) derived from the
    whole row's hash; the right side is replicated n_salt times. The
    join key becomes (key, salt), splitting a hot key's rows across
    n_salt shuffle partitions. Deterministic (no rand()), so retries /
    speculative tasks see identical salts.

    Cost model: replicates the RIGHT side n_salt×, so use when
    |right| ≪ |left| but right is too big to broadcast — exactly the
    mid-size-dimension-with-hot-keys case.
    """
    lcols = [c for c in left.columns]
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(n_salt))
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (key, salt) first (splits the hot key across partitions), then
    combine partials on key alone. Only algebraic aggregates (sum,
    count, min, max) compose; pass the PARTIAL expression in ``aggs``
    and the same name is re-summed in phase 2.

    Note Spark's hash aggregation already does map-side partials —
    this helps when the REDUCE side of one key exceeds a single task
    (e.g. count-distinct-style payloads or huge collect targets).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return phase1.groupBy(key).agg(
        *[F.sum(name).alias(name) for name in aggs.keys()]
    )


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    sort_key: str | None = None,
    path: str | None = None,
) -> None:
    """Persist a table pre-shuffled into n_buckets on bucket_key
    (Spark bucketing: saveAsTable with bucketBy, optionally
    sortBy for sort-merge-ready files). Subsequent equi-joins and
    groupBys on the bucket key read bucket-aligned splits and skip
    the exchange entirely — the write-once/join-many trade that wins
    for recurring fact-fact joins. ``path`` makes it an external
    table (data at path, bucketing metadata in the catalog)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        w = w.sortBy(sort_key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planner sees
    compatible HashPartitioning on both sides → no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)
