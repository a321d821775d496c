"""Regression tests for feed-format drift (the round-2 breaker): the
driver has shipped ``events.ts`` as int64 nanoseconds AND as tz-naive
``timestamp[us]`` across regenerations. ``normalize_ts`` must expose an
identical session-zone TIMESTAMP column for every layout, and the
``_us`` epoch helpers must accept whatever it produces — the Spark
analog of the reference's defensive ingest (data_manager.py:272-285).
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.tables import normalize_ts

TS_UTC = [
    dt.datetime(2026, 1, 1, 0, 0, 0),
    dt.datetime(2026, 1, 1, 0, 0, 1, 500000),
    dt.datetime(2026, 6, 30, 23, 59, 59, 999999),
    # adversarial: this instant's int64-nanos form exceeds the 53-bit
    # double mantissa in a way that truncates one microsecond under a
    # float `/ 1000` (int(float(us*1000)/1000) == us - 1) — pins the
    # integer-DIV requirement in normalize_ts's nanos branch
    dt.datetime(2026, 6, 30, 23, 59, 58, 16),
]
EPOCH_US = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS_UTC]


@pytest.fixture(scope="module")
def layouts_dir():
    d = Path(tempfile.mkdtemp(prefix="zspark_drift_"))
    ids = pa.array(range(1, len(TS_UTC) + 1), pa.int64())
    # layout A: int64 nanoseconds (old driver layout)
    pq.write_table(
        pa.table({"event_id": ids, "ts": pa.array([u * 1000 for u in EPOCH_US], pa.int64())}),
        d / "nanos.parquet",
    )
    # layout B: timestamp[us] tz-naive → Spark TIMESTAMP_NTZ (current layout)
    pq.write_table(
        pa.table({"event_id": ids, "ts": pa.array(TS_UTC, pa.timestamp("us"))}),
        d / "ntz.parquet",
    )
    # layout C: timestamp[us] UTC-adjusted → Spark TIMESTAMP
    pq.write_table(
        pa.table({"event_id": ids, "ts": pa.array(TS_UTC, pa.timestamp("us", tz="UTC"))}),
        d / "tz.parquet",
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("layout", ["nanos", "ntz", "tz"])
def test_normalize_ts_unifies_every_layout(spark, layouts_dir, layout):
    df = normalize_ts(spark.read.parquet(str(layouts_dir / f"{layout}.parquet")))
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r["us"] for r in df.select(
        "event_id", F.unix_micros("ts").alias("us")
    ).collect()}
    assert got == {i + 1: u for i, u in enumerate(EPOCH_US)}


@pytest.mark.parametrize("module", ["flow", "timeseries"])
def test_us_helper_accepts_ntz(spark, layouts_dir, module):
    """_us() must not reject a TIMESTAMP_NTZ column that reached an
    operator without passing through normalize_ts."""
    import importlib

    ops = importlib.import_module(f"zcode_iceberg_spark.operators.{module}")
    raw = spark.read.parquet(str(layouts_dir / "ntz.parquet"))
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    got = [r["us"] for r in raw.select(ops._us("ts").alias("us")).collect()]
    assert sorted(got) == sorted(EPOCH_US)


@pytest.mark.parametrize("module", ["flow", "timeseries"])
def test_us_helper_rejects_raw_nanos_long(spark, layouts_dir, module):
    """A raw int64-nanos column that bypassed normalize_ts must fail
    analysis loudly — a plain timestamp cast would silently read it as
    epoch SECONDS (far-future values, wrong windows)."""
    import importlib

    from pyspark.errors import AnalysisException

    ops = importlib.import_module(f"zcode_iceberg_spark.operators.{module}")
    raw = spark.read.parquet(str(layouts_dir / "nanos.parquet"))
    assert dict(raw.dtypes)["ts"] in ("bigint", "long")
    with pytest.raises(AnalysisException):
        raw.select(ops._us("ts")).collect()


def test_normalize_ts_nanos_floor_for_negatives(spark, tmp_path):
    """floor(ns/1000), not truncation toward zero: pre-1970 nanos with
    sub-microsecond remainders must round DOWN (-1500 ns -> -2 us)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([-1500, -999, 999, 1500], pa.int64()),
            }
        ),
        tmp_path / "neg.parquet",
    )
    df = normalize_ts(spark.read.parquet(str(tmp_path / "neg.parquet")))
    got = {r["event_id"]: r["us"] for r in df.select(
        "event_id", F.unix_micros("ts").alias("us")
    ).collect()}
    assert got == {1: -2, 2: -1, 3: 0, 4: 1}
