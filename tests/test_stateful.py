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


def test_fsm_oracle_walk_covers_every_branch(spark):
    """Kernel ↔ recursive-CTE-oracle equivalence on crafted decision
    paths exercising branches the fixtures never hit: TIME stops, the
    TP-over-TIME precedence, re-entry after exit, the |z| >= 1.5 entry
    boundary, qty sized from a pre-entry first tick, a same-row
    EOD close, and a never-entering key."""
    import datetime as dt

    import duckdb

    from zcode_iceberg_spark.operators import stateful as st
    from zcode_iceberg_spark.suite.stateful import fsm_closed_cte

    t0 = dt.datetime(2026, 1, 2, 0, 0, 0)

    def row(uid, secs, eid, price, z):
        return (uid, t0 + dt.timedelta(seconds=secs), eid, price, z)

    rows = [
        # u1 LONG: TP, then re-entry -> SL
        row(1, 0, 1, 100.0, 2.0),
        row(1, 60, 2, 101.5, 0.0),        # +1.5% -> TP
        row(1, 120, 3, 100.0, 2.0),       # re-enter
        row(1, 180, 4, 98.9, 0.0),        # -1.1% -> SL
        # u2 SHORT: TP, then boundary-entry (z = -1.5) -> SL
        row(2, 0, 5, 200.0, -2.0),
        row(2, 60, 6, 197.0, 0.0),        # short +1.5% -> TP
        row(2, 120, 7, 200.0, -1.5),      # boundary entry, SHORT
        row(2, 180, 8, 202.5, 0.0),       # short -1.25% -> SL
        # u3: TP wins over a simultaneous TIME trigger; then a real TIME
        row(3, 0, 9, 50.0, 1.6),
        row(3, 43200, 10, 50.1, 0.0),                  # in band, holds
        row(3, 90000, 11, 50.9, 0.0),                  # >24h AND +1.8% -> TP
        row(3, 90060, 12, 51.0, 1.7),                  # re-enter
        row(3, 93660, 13, 51.1, 0.0),                  # in band
        row(3, 180000, 14, 51.2, 0.0),                 # >24h in band -> TIME
        # u4: qty sized from pre-entry first tick (80), EOD at last
        row(4, 0, 15, 80.0, 0.0),
        row(4, 60, 16, 75.0, 1.5),
        row(4, 120, 17, 75.1, 0.0),                    # in band -> EOD
        # u5: never enters
        row(5, 0, 18, 10.0, 1.49),
        row(5, 60, 19, 10.0, -1.49),
        # u6: enters on its only row -> zero-hold EOD
        row(6, 0, 20, 40.0, 2.0),
        # u7: dyadic first price (1250/10.24 is a banker's-rounding tie)
        row(7, 0, 21, 10.24, 2.0),
        row(7, 60, 22, 10.40, 0.0),                    # +1.56% -> TP
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "price", "z"]
    )
    dec = spark.createDataFrame(pdf)
    got = (
        st.position_fsm(dec)
        .toPandas()
        .sort_values(["user_id", "trade_seq"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("fsm_dec_test", pdf)
    sql = fsm_closed_cte(
        "dec AS (SELECT user_id, ts, event_id, price, z,"
        " row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        " AS rn FROM fsm_dec_test)"
    ) + (
        "\nSELECT user_id, trade_seq, side, entry_ts, exit_ts, entry_price,"
        " exit_price, qty, pnl, exit_reason, hold_secs FROM closed"
        " ORDER BY user_id, trade_seq"
    )
    want = con.execute(sql).df().reset_index(drop=True)

    assert len(got) == len(want) == 9
    assert list(got["exit_reason"]) == list(want["exit_reason"])
    # every branch appears; u5 never trades; u3's first exit is TP not TIME
    assert set(got["exit_reason"]) == {"TP", "SL", "TIME", "EOD"}
    assert 5 not in set(got["user_id"])
    u3 = got[got["user_id"] == 3].sort_values("trade_seq")
    assert list(u3["exit_reason"]) == ["TP", "TIME"]
    for c in ("user_id", "trade_seq", "side"):
        assert list(got[c]) == list(want[c]), c
    for c in ("entry_price", "exit_price", "qty", "pnl", "hold_secs"):
        assert (got[c] - want[c]).abs().max() == 0.0, c
    # u4 sized from its pre-entry first tick (1250/80), not entry price
    assert got.loc[got["user_id"] == 4, "qty"].iloc[0] == round(1250 / 80.0, 6)
    # u7 banker's tie: Python round == DuckDB round_even
    assert got.loc[got["user_id"] == 7, "qty"].iloc[0] == 122.070312
    # u6 zero-hold EOD
    u6 = got[got["user_id"] == 6]
    assert u6["hold_secs"].iloc[0] == 0.0 and u6["pnl"].iloc[0] == 0.0


def test_avg_micro_exact_formula_is_exact_half_away_mean():
    """The integer formula behind avg_micro_exact — sign-split
    (2s+n) DIV (2n) on micro-units — must equal round-half-away-from-
    zero of the EXACT rational mean at 6 decimals, for any inputs.
    Verified against Fraction arithmetic over randomized micro-unit
    samples including exact .5 ties."""
    from fractions import Fraction

    from hypothesis import given, settings, strategies as st

    def formula(us: list) -> float:
        s, n = sum(us), len(us)
        if s >= 0:
            q = (2 * s + n) // (2 * n)
        else:
            q = -((2 * -s + n) // (2 * n))
        return q / 1e6

    def exact(us: list) -> float:
        mean = Fraction(sum(us), len(us))  # already micro-units
        sign = -1 if mean < 0 else 1
        m = abs(mean)
        floor_m = m.numerator // m.denominator
        frac = m - floor_m
        q = floor_m + (1 if frac >= Fraction(1, 2) else 0)
        return sign * q / 1e6

    @given(
        st.lists(
            st.integers(min_value=-(10**12), max_value=10**12),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(us):
        assert formula(us) == exact(us)

    check()
    # hand-picked exact ties: mean = ±x.5 micro-units
    assert formula([1, 2]) == 2 / 1e6          # 1.5 -> 2 (away)
    assert formula([-1, -2]) == -2 / 1e6       # -1.5 -> -2 (away)
    assert formula([0, 1]) == 1 / 1e6          # 0.5 -> 1
    assert formula([0, -1]) == -1 / 1e6        # -0.5 -> -1


def test_drawdown_invariants(spark, sf_dir):
    """Drawdown algebra: peak is the running max of equity (so
    peak >= equity everywhere), drawdown = peak - equity >= 0, and the
    final equity equals the user's total ledger P&L (micro-rounded) —
    ties the windowed curve back to the plain aggregate."""
    from zcode_iceberg_spark.suite.stateful import (
        _decisions,
        q_ledger_drawdown,
    )
    from zcode_iceberg_spark.operators import stateful as st_ops

    rows = q_ledger_drawdown(spark, sf_dir).collect()
    assert rows
    last_eq: dict = {}
    for r in rows:
        assert r["peak"] >= r["equity"] - 1e-9
        assert abs(r["drawdown"] - (r["peak"] - r["equity"])) < 1e-9
        cur = last_eq.get(r["user_id"])
        if cur is None or r["trade_seq"] > cur[0]:
            last_eq[r["user_id"]] = (r["trade_seq"], r["equity"])
    led = st_ops.position_fsm(_decisions(spark, sf_dir))
    totals = {
        r["user_id"]: r["t"]
        for r in led.groupBy("user_id")
        .agg((F.sum(st_ops.micro("pnl")) / 1e6).alias("t"))
        .collect()
    }
    for uid, (_, eq) in last_eq.items():
        assert abs(eq - totals[uid]) < 1e-9, uid
