"""Property tests for the non-SQL stateful operators (FSM ledger) and
batch↔streaming equivalence of the shared hysteresis kernel."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pandas as pd
import pytest

from pyspark.sql import functions as F

from zcode_iceberg_spark.operators.stateful import _hysteresis_fold
from zcode_iceberg_spark.suite.stateful import (
    _decisions,
    q_ledger_daily_summary,
    q_position_ledger,
)


@pytest.fixture(scope="module")
def ledger(spark, sf_dir):
    return q_position_ledger(spark, sf_dir).toPandas()


def test_ledger_invariants(ledger):
    assert len(ledger) > 0
    # pnl consistency: pnl == (exit-entry)·dir·qty
    direction = ledger["side"].map({"LONG": 1.0, "SHORT": -1.0})
    expect = (
        (ledger["exit_price"] - ledger["entry_price"]) * direction * ledger["qty"]
    )
    assert ((ledger["pnl"] - expect).abs() < 1e-4).all()
    # roi = pnl / margin (margin=50)
    assert ((ledger["roi"] - ledger["pnl"] / 50.0).abs() < 1e-4).all()
    # ordering: exit after entry
    assert (
        pd.to_datetime(ledger["exit_ts"]) >= pd.to_datetime(ledger["entry_ts"])
    ).all()
    # per-key sequence is 1..n contiguous
    for _, grp in ledger.groupby("user_id"):
        seqs = sorted(grp["trade_seq"])
        assert seqs == list(range(1, len(seqs) + 1))
    # exit reasons from the closed set
    assert set(ledger["exit_reason"]) <= {"TP", "SL", "TIME", "EOD"}


def test_tp_sl_exits_hit_their_bands(ledger):
    direction = ledger["side"].map({"LONG": 1.0, "SHORT": -1.0})
    change = (
        (ledger["exit_price"] - ledger["entry_price"])
        / ledger["entry_price"]
        * direction
    )
    tp = ledger["exit_reason"] == "TP"
    sl = ledger["exit_reason"] == "SL"
    assert (change[tp] >= 0.01 - 1e-9).all()
    assert (change[sl] <= -0.01 + 1e-9).all()


def test_daily_summary_consistency(spark, sf_dir, ledger):
    daily = q_ledger_daily_summary(spark, sf_dir).toPandas()
    assert daily["n_trades"].sum() == len(ledger)
    assert (daily["n_wins"] + daily["n_losses"] == daily["n_trades"]).all()
    assert abs(daily["total_pnl"].sum() - round(ledger["pnl"], 6).sum()) < 1e-3


def test_hysteresis_kernel_split_invariance():
    """Streaming equivalence at the kernel level: folding a sequence
    in arbitrary chunk splits with carried state must equal one batch
    fold — the exact contract applyInPandasWithState relies on."""
    import random

    rng = random.Random(7)
    seq = [rng.choice(["UP", "DOWN", "RANGE"]) for _ in range(200)]
    batch_lab, batch_cnt, _ = _hysteresis_fold(pd.Series(seq), 2)
    for split_seed in range(5):
        r2 = random.Random(split_seed)
        state = ("RANGE", None, 0)
        got: list[str] = []
        i = 0
        while i < len(seq):
            j = min(len(seq), i + r2.randint(1, 17))
            labs, _, state = _hysteresis_fold(pd.Series(seq[i:j]), 2, *state)
            got.extend(labs)
            i = j
        assert got == batch_lab


def test_streaming_matches_batch_hysteresis(spark, sf_dir):
    """End-to-end: file-source stream + applyInPandasWithState over the
    fixture equals the batch applyInPandas result."""
    from zcode_iceberg_spark.operators.stateful import hysteresis
    from zcode_iceberg_spark.streaming import (
        hysteresis_stream,
        run_available_now,
        stream_events,
    )

    batch = (
        _decisions(spark, sf_dir)
        .select("user_id", "ts", "event_id", "raw_label")
    )
    expected = (
        hysteresis(batch, label_col="raw_label", confirm_k=2)
        .select("user_id", "event_id", "confirmed_label")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )

    tmp = Path(tempfile.mkdtemp(prefix="zspark_stream_"))
    try:
        # single-file source => one micro-batch; the kernel-split test
        # above covers multi-batch state carry
        src = str(Path(sf_dir) / "events.parquet")
        stream_src = tmp / "src"
        stream_src.mkdir()
        shutil.copy(src, stream_src / "events.parquet")

        ticks = stream_events(spark, str(stream_src))
        # batch twin of the label derivation, inlined on the stream:
        # reuse the deterministic per-row z labels from the batch side
        # by joining is impossible mid-stream; instead re-derive labels
        # in batch and feed them through the stateful operator only.
        labeled_batch = batch
        # applyInPandasWithState needs a streaming DF; rebuild labels
        # stream-side from a static lookup written to parquet.
        lookup_dir = tmp / "labeled"
        labeled_batch.write.parquet(str(lookup_dir))
        labeled_stream = (
            spark.readStream.schema(labeled_batch.schema)
            .parquet(str(lookup_dir))
        )
        out = hysteresis_stream(labeled_stream, confirm_k=2)
        run_available_now(out, str(tmp / "out"), str(tmp / "ckpt"))
        got = (
            spark.read.parquet(str(tmp / "out"))
            .select("user_id", "event_id", "confirmed_label")
            .toPandas()
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True)
        )
        assert len(got) == len(expected)
        merged = got.merge(
            expected, on=["user_id", "event_id"], suffixes=("_s", "_b")
        )
        assert (merged["confirmed_label_s"] == merged["confirmed_label_b"]).all()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_windowed_agg_matches_batch(spark, sf_dir):
    """Sliding-window taker delta: streaming result (availableNow)
    equals the batch tumbling equivalent for completed windows."""
    from zcode_iceberg_spark.sources.tables import events_ticks
    from zcode_iceberg_spark.streaming import (
        run_available_now,
        stream_events,
        windowed_delta_stream,
    )

    tmp = Path(tempfile.mkdtemp(prefix="zspark_stream2_"))
    try:
        stream_src = tmp / "src"
        stream_src.mkdir()
        shutil.copy(
            str(Path(sf_dir) / "events.parquet"), stream_src / "events.parquet"
        )
        ticks = stream_events(spark, str(stream_src))
        agg = windowed_delta_stream(ticks)
        run_available_now(agg, str(tmp / "out"), str(tmp / "ckpt"))
        got = spark.read.parquet(str(tmp / "out"))

        batch = events_ticks(spark, sf_dir)
        expected = (
            batch.groupBy(
                "user_id", F.window("ts", "10 minutes", "5 minutes").alias("w")
            )
            .agg(
                (
                    F.sum(F.when(F.col("is_buy"), F.col("qty")).otherwise(0.0))
                    - F.sum(F.when(~F.col("is_buy"), F.col("qty")).otherwise(0.0))
                ).alias("delta")
            )
            .select("user_id", F.col("w.start").alias("win_start"), "delta")
        )
        g = got.select("user_id", "win_start", F.round("delta", 6).alias("delta")).toPandas()
        e = expected.select(
            "user_id", "win_start", F.round("delta", 6).alias("delta")
        ).toPandas()
        g = g.sort_values(["user_id", "win_start"]).reset_index(drop=True)
        e = e.sort_values(["user_id", "win_start"]).reset_index(drop=True)
        # streaming append-mode emits only watermark-closed windows —
        # a subset of batch windows; every emitted window must match.
        merged = g.merge(e, on=["user_id", "win_start"], suffixes=("_s", "_b"))
        assert len(merged) == len(g) and len(g) > 0
        assert ((merged["delta_s"] - merged["delta_b"]).abs() < 1e-6).all()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
