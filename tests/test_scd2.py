"""scd2_incremental non-degeneracy: the oracle proves the apply equals
the rebuild, but only these checks prove the split actually EXERCISES
the merge machinery — a cut that no open version crosses would make
the apply trivially correct."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.tables import events_ticks
from zcode_iceberg_spark.suite.flow import (
    SCD2_SPLIT,
    _scd2_runs,
    q_scd2_incremental,
    q_scd2_versions,
)


def _split(spark, sf_dir):
    t = events_ticks(spark, sf_dir).select(
        "user_id", "ts", "event_id", F.col("event_type").alias("attr")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp_ntz").cast("timestamp"))
    rng = t.agg(F.min(us).alias("mnt"), F.max(us).alias("mxt")).select(
        (
            F.col("mnt")
            + F.floor(F.lit(SCD2_SPLIT) * (F.col("mxt") - F.col("mnt")))
        ).alias("cut_us")
    )
    tt = t.withColumn("us", us).crossJoin(F.broadcast(rng))
    return (
        tt.filter(F.col("us") < F.col("cut_us")).drop("us", "cut_us"),
        tt.filter(F.col("us") >= F.col("cut_us")).drop("us", "cut_us"),
    )


def test_apply_paths_are_exercised(spark, sf_dir):
    hist, batch = _split(spark, sf_dir)
    hr = _scd2_runs(hist)
    open_v = (
        hr.withColumn(
            "maxv", F.max("version").over(Window.partitionBy("user_id"))
        )
        .filter(F.col("version") == F.col("maxv"))
        .select("user_id", F.col("attr").alias("open_attr"))
    )
    first_runs = _scd2_runs(batch).filter(F.col("version") == 1)
    j = first_runs.join(open_v, "user_id", "inner")
    n_cont = j.filter(F.col("attr") == F.col("open_attr")).count()
    n_close = j.filter(F.col("attr") != F.col("open_attr")).count()
    # both the extend-open and close-open paths must occur in the data
    assert n_cont > 0, "no batch run continues an open version"
    assert n_close > 0, "no batch run closes an open version"


def test_incremental_equals_rebuild_frame(spark, sf_dir):
    inc = q_scd2_incremental(spark, sf_dir)
    full = q_scd2_versions(spark, sf_dir)
    cols = full.columns
    assert inc.columns == cols
    diff = inc.select(cols).exceptAll(full.select(cols)).count()
    diff2 = full.select(cols).exceptAll(inc.select(cols)).count()
    assert diff == 0 and diff2 == 0, (diff, diff2)
