"""Sink + maintenance-op tests: partitioned append, dynamic-partition
upsert, compaction, table stats."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.sinks import (
    compact_parquet,
    table_stats,
    upsert_daily_partitions,
    write_partitioned_append,
)
from zcode_iceberg_spark.sources.tables import events_ticks


@pytest.fixture()
def tmp(request):
    d = Path(tempfile.mkdtemp(prefix="zspark_sink_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_append_and_pruning(spark, sf_dir, tmp):
    t = events_ticks(spark, sf_dir).select("event_id", "ts", "user_id", "price")
    write_partitioned_append(t, str(tmp / "ledger"), ts_col="ts")
    days = [p.name for p in (tmp / "ledger").iterdir() if p.name.startswith("day=")]
    assert len(days) > 1
    back = spark.read.parquet(str(tmp / "ledger"))
    assert back.count() == t.count()
    # partition pruning: filtering one day must scan only that partition
    one_day = sorted(days)[0].split("=")[1]
    plan = (
        back.filter(F.col("day") == one_day)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(day" in plan


def test_upsert_daily_partitions(spark, tmp):
    df1 = spark.createDataFrame(
        [("2024-01-01", 1.0), ("2024-01-02", 2.0)], ["day", "total"]
    )
    upsert_daily_partitions(df1, str(tmp / "daily"))
    # second write updates day 2 and adds day 3; day 1 must survive
    df2 = spark.createDataFrame(
        [("2024-01-02", 20.0), ("2024-01-03", 3.0)], ["day", "total"]
    )
    upsert_daily_partitions(df2, str(tmp / "daily"))
    # partition-column type inference reads day= values back as dates
    got = {
        str(r["day"]): r["total"]
        for r in spark.read.parquet(str(tmp / "daily")).collect()
    }
    assert got == {"2024-01-01": 1.0, "2024-01-02": 20.0, "2024-01-03": 3.0}


def test_compact_parquet(spark, sf_dir, tmp):
    src = tmp / "fragmented"
    t = events_ticks(spark, sf_dir).select("event_id", "ts", "price")
    t.repartition(16).write.parquet(str(src))
    n_before = len(list(src.glob("*.parquet")))
    assert n_before >= 16
    n_target = compact_parquet(spark, str(src), str(tmp / "compact"), target_file_mb=128)
    n_after = len(list((tmp / "compact").glob("*.parquet")))
    assert n_after == n_target == 1  # tiny table → single target file
    assert (
        spark.read.parquet(str(tmp / "compact")).count() == t.count()
    )


def test_table_stats(spark, sf_dir, tmp):
    t = events_ticks(spark, sf_dir).select("event_id", "price")
    t.write.parquet(str(tmp / "t"))
    stats = table_stats(spark, str(tmp / "t"))
    assert stats["n_rows"] == t.count()
    assert stats["n_files"] >= 1 and stats["total_bytes"] > 0
    assert stats["column_ranges"]["min_price"] > 0
