"""Lifecycle supervision (streaming/lifecycle.py): crash mid-feed →
bounded-backoff restart with state intact; staleness probe → stop +
restart; probe logic itself unit-tested against a stub query.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from zcode_iceberg_spark.streaming.lifecycle import (
    progress_stale_probe,
    supervise,
)

SCHEMA = "doc_id long, text string"


def _write_shards(spark, sf_dir, src, n=4):
    from zcode_iceberg_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    rows = docs.collect()
    per = (len(rows) + n - 1) // n
    for i in range(n):
        chunk = rows[i * per : (i + 1) * per]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            f"{src}/shard={i}"
        )
    return {(r["doc_id"]) for r in rows}


def test_supervise_restarts_after_midfeed_crash(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    marker = tmp_path / "crashed_once"
    log = tmp_path / "epochs.log"
    want_ids = _write_shards(spark, sf_dir, src, n=4)

    def step(batch_df, epoch_id):
        with open(log, "a") as f:
            f.write(f"{epoch_id}\n")
        if epoch_id == 2 and not marker.exists():
            marker.touch()
            raise RuntimeError("injected mid-feed crash")
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    def factory():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(step)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    report = supervise(factory, max_restarts=3, backoff_sec=0.05)
    assert report["completed"] is True
    assert report["restarts"] == 1
    assert any("injected" in f for f in report["failures"])

    # state intact across the restart: committed epochs 0/1 are NOT
    # re-delivered — the resumed attempt re-runs only the crashed epoch
    epochs = [int(x) for x in log.read_text().split()]
    crash_at = epochs.index(2)
    assert epochs[: crash_at + 1] == [0, 1, 2]
    assert epochs[crash_at + 1] == 2  # resume point, not a replay of 0
    assert epochs.count(0) == 1 and epochs.count(1) == 1

    # and the output holds every input row exactly once
    got = spark.read.parquet(out)
    ids = [r["doc_id"] for r in got.select("doc_id").collect()]
    assert sorted(ids) == sorted(want_ids)


def test_supervise_stale_probe_stops_and_restarts(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    wedge = tmp_path / "wedge"
    want_ids = _write_shards(spark, sf_dir, src, n=3)
    wedge.touch()  # first batch hangs while this exists

    def step(batch_df, epoch_id):
        t0 = time.monotonic()
        while wedge.exists() and time.monotonic() - t0 < 10:
            time.sleep(0.05)
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    def factory():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(step)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    def probe():
        # the deploy-side staleness signal (staleness_stream alerts /
        # progress silence); firing also clears the wedge so the stuck
        # batch can drain and the restart makes progress
        if wedge.exists():
            wedge.unlink()
            return True
        return False

    report = supervise(
        factory, max_restarts=3, backoff_sec=0.05, stale_probe=probe
    )
    assert report["completed"] is True
    assert report["stale_restarts"] == 1
    got = spark.read.parquet(out)
    ids = [r["doc_id"] for r in got.select("doc_id").collect()]
    assert sorted(ids) == sorted(want_ids)


def test_supervise_budget_exhaustion_reports_failure(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    _write_shards(spark, sf_dir, src, n=2)

    def step(batch_df, epoch_id):
        raise RuntimeError("always broken")

    def factory():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(step)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    report = supervise(factory, max_restarts=2, backoff_sec=0.01)
    assert report["completed"] is False
    assert report["restarts"] == 2
    assert len(report["failures"]) == 3  # initial attempt + 2 restarts


def test_alert_table_probe(spark, tmp_path):
    """The glue between staleness_stream's alert sink and supervise:
    fires exactly when NEW alert rows land, stays quiet otherwise."""
    from zcode_iceberg_spark.streaming.lifecycle import alert_table_probe

    alert_dir = str(tmp_path / "alerts")
    probe = alert_table_probe(spark, alert_dir)
    assert probe() is False  # sink not created yet — healthy
    spark.createDataFrame(
        [("u1", "stale")], "user_id string, status string"
    ).write.mode("append").parquet(alert_dir)
    spark.catalog.refreshByPath(alert_dir)
    assert probe() is True  # new alert row → restart signal
    assert probe() is False  # no further rows → quiet
    spark.createDataFrame(
        [("u2", "stale")], "user_id string, status string"
    ).write.mode("append").parquet(alert_dir)
    spark.catalog.refreshByPath(alert_dir)
    assert probe() is True

    # pre-existing alerts are the BASELINE for a fresh probe (a new
    # supervisor incarnation must not restart on history)
    probe2 = alert_table_probe(spark, alert_dir)
    assert probe2() is False
    spark.createDataFrame(
        [("u3", "stale")], "user_id string, status string"
    ).write.mode("append").parquet(alert_dir)
    assert probe2() is True


def test_h9_end_to_end_alerts_drive_restart(spark, sf_dir, tmp_path):
    """The full H9 chain with REAL alert rows: a silent key makes
    staleness_stream's event-time timer fire → its alert lands in the
    alert table → alert_table_probe reports staleness →
    supervise stops the main pipeline and restarts it on the same
    checkpoint → the restarted run completes with exactly-once
    output."""
    import datetime as dt
    import os
    import shutil
    import time as time_mod

    from zcode_iceberg_spark.streaming.lifecycle import alert_table_probe
    from zcode_iceberg_spark.streaming.pipeline import (
        run_available_now,
        staleness_stream,
        stream_events_raw,
    )

    # --- 1. the watchdog: user 2 goes silent, its timer fires
    t0 = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, t0 + dt.timedelta(seconds=s), u, "view", 1.0, '{"k":"1"}')
                for i, (u, s) in enumerate(rows)
            ],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, rows in enumerate(
        [[(1, 0), (1, 10), (2, 5)], [(1, 1200), (1, 1210)], [(1, 2400)]]
    ):
        sub = tmp_path / f"fpart{i}"
        mk(rows).coalesce(1).write.parquet(str(sub))
        f = next(sub.glob("*.parquet"))
        dst = feed / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (time_mod.time() + i, time_mod.time() + i))
    # the probe is created BEFORE the watchdog fires — its baseline is
    # the empty table, so the alert that lands below counts as NEW
    alert_dir = str(tmp_path / "alerts")
    probe = alert_table_probe(spark, alert_dir)
    run_available_now(
        staleness_stream(stream_events_raw(spark, str(feed)), max_silence_sec=300),
        str(tmp_path / "watch_raw"),
        str(tmp_path / "watch_ck"),
    )
    alerts = spark.read.parquet(str(tmp_path / "watch_raw")).filter(
        F.col("kind") == "stale"
    )
    assert alerts.count() == 1  # the silent key really fired
    alerts.write.parquet(alert_dir)

    # --- 2. the supervised main pipeline
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    want_ids = _write_shards(spark, sf_dir, src, n=2)
    calls = {"n": 0}

    def step(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    def factory():
        calls["n"] += 1
        w = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(step)
            .option("checkpointLocation", ck)
        )
        # first attempt models the long-running deployment (continuous
        # trigger); the post-restart attempt drains and completes so
        # the test terminates
        if calls["n"] == 1:
            w = w.trigger(processingTime="1 second")
        else:
            w = w.trigger(availableNow=True)
        return w.start()

    report = supervise(
        factory,
        max_restarts=3,
        backoff_sec=0.05,
        poll_sec=0.1,
        stale_probe=probe,
    )
    assert report["completed"] is True
    assert report["stale_restarts"] == 1
    assert calls["n"] == 2
    got = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(want_ids)


def test_progress_stale_probe_logic():
    class StubQuery:
        def __init__(self):
            self.lastProgress = None

    q = StubQuery()
    probe = progress_stale_probe(lambda: q, max_silence_sec=0.2)
    assert probe() is False  # fresh timer
    q.lastProgress = {"timestamp": "t1"}
    assert probe() is False  # progress moved → timer reset
    time.sleep(0.25)
    assert probe() is True  # no new progress past the threshold
    q.lastProgress = {"timestamp": "t2"}
    assert probe() is False  # recovered


def test_h7_processing_time_cadence_matches_available_now(
    spark, sf_dir, tmp_path
):
    """H7: the production trigger cadence, observed. A processingTime
    trigger fires micro-batches on interval ticks (the reference's
    50 ms strategy throttle, main.py:128-132 → trigger interval), and
    composes with the H9 supervisor via the until-condition. Asserts
    ≥2 data batches on distinct interval ticks AND that the triggered
    run lands exactly the rows an availableNow drain does."""
    import datetime

    from zcode_iceberg_spark.streaming.lifecycle import run_processing_time
    from zcode_iceberg_spark.streaming.pipeline import run_available_now

    src = str(tmp_path / "src")
    want_ids = _write_shards(spark, sf_dir, src, n=3)

    def stream():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("doc_id", F.length("text").alias("n_chars"))
        )

    res = run_processing_time(
        stream(),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        interval="1 second",
        min_data_batches=3,  # all shards → full drain, comparable below
        timeout_sec=90.0,
    )
    assert res["timed_out"] is False
    assert res["report"]["completed"] is True
    data = [p for p in res["progress"] if p["numInputRows"] > 0]
    assert len(data) >= 3  # one per shard (maxFilesPerTrigger=1)

    stamps = sorted(
        datetime.datetime.fromisoformat(
            p["timestamp"].replace("Z", "+00:00")
        ).timestamp()
        for p in data
    )
    # tick-aligned cadence: batches land on distinct interval ticks,
    # and consecutive ALIGNED batches (skip the unaligned first
    # trigger) are spaced at least ~one interval apart
    assert len({int(s) for s in stamps}) >= 2
    gaps = [b - a for a, b in zip(stamps[1:], stamps[2:])]
    assert all(g >= 0.8 for g in gaps), gaps

    # cadence changes WHEN rows land, never WHICH rows land
    run_available_now(
        stream(), str(tmp_path / "out2"), str(tmp_path / "ck2")
    )
    got = {
        (r["doc_id"], r["n_chars"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["doc_id"], r["n_chars"])
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert got == want
    assert {i for i, _ in got} == want_ids
