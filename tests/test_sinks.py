"""Sink + maintenance-op tests: partitioned append, dynamic-partition
upsert, compaction, table stats."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.sinks import (
    cluster_rewrite,
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


def test_cluster_rewrite_enables_file_skipping(spark, sf_dir, tmp):
    """After a sort-order rewrite on l_shipdate, parquet footer
    min/max stats must partition the key space into near-disjoint
    per-file ranges — i.e. a narrow date predicate can skip all but
    ~1 file. Checked from the actual footers (pyarrow), not the plan:
    this is the property ANY engine's scan pruning consumes."""
    import pyarrow.parquet as pq

    dst = tmp / "li_clustered"
    cluster_rewrite(
        spark, f"{sf_dir}/lineitem.parquet", str(dst), ["l_shipdate"], 8
    )
    files = sorted(dst.glob("*.parquet"))
    assert len(files) == 8

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))

    # near-disjoint: ordered by min, each file's range may touch its
    # neighbor only at the range-partition boundary value
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # skipping evidence: a one-day predicate overlaps at most 2 files
    probe = ranges[3][0]
    overlapping = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(overlapping) <= 2, overlapping

    # and the rewrite is lossless
    n = spark.read.parquet(str(dst)).count()
    assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


def test_zorder_rewrite_clusters_both_dimensions(spark, sf_dir, tmp):
    """Z-order vs linear sort on (l_extendedprice, l_quantity): the
    linear layout gives tight per-file ranges only on its FIRST sort
    column — each file spans ~the full quantity domain. The Morton
    layout must shrink the average per-file span of BOTH columns,
    which is exactly what makes min/max skipping work for predicates
    on either column."""
    import pyarrow.parquet as pq
    from zcode_iceberg_spark.sources.sinks import zorder_rewrite

    src = f"{sf_dir}/lineitem.parquet"

    def spans(path, col):
        out = []
        for f in sorted(Path(path).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mn = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            out.append(float(mx) - float(mn))
        return out

    zorder_rewrite(
        spark, src, str(tmp / "z"), ["l_extendedprice", "l_quantity"], 16
    )
    cluster_rewrite(
        spark, src, str(tmp / "lin"), ["l_extendedprice", "l_quantity"], 16
    )

    import statistics

    row = spark.read.parquet(src).agg(
        F.max("l_quantity"), F.min("l_quantity"),
        F.max("l_extendedprice"), F.min("l_extendedprice"),
    ).collect()[0]
    q_dom = float(row[0] - row[1])
    p_dom = float(row[2] - row[3])

    z_q = statistics.mean(spans(tmp / "z", "l_quantity")) / q_dom
    lin_q = statistics.mean(spans(tmp / "lin", "l_quantity")) / q_dom
    z_p = statistics.mean(spans(tmp / "z", "l_extendedprice")) / p_dom

    # linear: 2nd column unclustered (≈ full domain per file);
    # z-order: both columns materially clustered
    assert lin_q > 0.9, lin_q
    assert z_q < 0.6, z_q
    assert z_p < 0.6, z_p

    assert (
        spark.read.parquet(str(tmp / "z")).count()
        == spark.read.parquet(src).count()
    )


def test_merge_upsert_row_level(spark, sf_dir, tmp):
    """MERGE semantics on a plain-parquet table: matched keys are
    replaced by the update rows, unmatched update rows are inserted,
    untouched rows survive byte-identically."""
    from zcode_iceberg_spark.sources.sinks import merge_upsert

    path = str(tmp / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, tag string, val double",
    )
    base.write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, tag string, val double"
    )
    merge_upsert(spark, path, updates, "id")

    got = {
        r["id"]: (r["tag"], r["val"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        3: ("c", 30.0),
        4: ("d", 40.0),
    }
    # idempotent re-apply
    merge_upsert(spark, path, updates, "id")
    assert spark.read.parquet(path).count() == 4


def test_snapshot_versioning_time_travel(spark, tmp):
    """Snapshot writes never mutate earlier versions: v0 stays
    readable (time travel) after v1 lands, the latest read follows
    the newest version, and expiry removes exactly the oldest."""
    from zcode_iceberg_spark.sources.sinks import (
        expire_snapshots,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp / "snap_tbl")
    v0 = write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, tag string"), t
    )
    v1 = write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string"), t
    )
    assert (v0, v1) == (0, 1)
    assert read_snapshot(spark, t).count() == 2  # latest
    assert read_snapshot(spark, t, 0).count() == 1  # time travel
    assert expire_snapshots(t, keep_last=1) == [0]
    assert read_snapshot(spark, t).count() == 2
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0)


def test_snapshot_schema_evolution_read(spark, tmp):
    """Additive schema evolution across snapshot versions: a column
    added in v1 reads as NULL for v0 rows under mergeSchema, and each
    pinned version keeps its own exact schema."""
    from zcode_iceberg_spark.sources.sinks import read_snapshot, write_snapshot

    t = str(tmp / "evo_tbl")
    write_snapshot(spark.createDataFrame([(1,)], "id long"), t)
    write_snapshot(
        spark.createDataFrame([(2, "x")], "id long, note string"), t
    )
    union = spark.read.option("mergeSchema", "true").parquet(t)
    rows = {r["id"]: r["note"] for r in union.collect()}
    assert rows == {1: None, 2: "x"}
    assert read_snapshot(spark, t, 0).columns == ["id"]
    assert "note" in read_snapshot(spark, t, 1).columns


def test_schema_log_evolution_rename_widen_add(spark, tmp):
    """Full schema-evolution lifecycle over the snapshot layout: rename
    + type-widen + add are O(metadata) log appends — no file rewrite —
    and evolved_read surfaces every vintage in the CURRENT schema (old
    names mapped, narrow types cast up, missing columns NULL). This is
    the case mergeSchema cannot do (it has no rename lineage and fails
    on int-vs-bigint)."""
    from zcode_iceberg_spark.sources.sinks import (
        evolved_read,
        log_schema_action,
        write_snapshot,
    )

    t = str(tmp / "evo2")
    # v0: original schema (qty int)
    write_snapshot(spark.createDataFrame([(1, 10)], "id long, qty int"), t)
    # schema changes, logged not rewritten
    log_schema_action(t, "rename", from_name="qty", to="quantity")
    log_schema_action(t, "widen", col="quantity", to="bigint")
    log_schema_action(t, "add", col="note", type="string")
    # v1: written in the current schema
    write_snapshot(
        spark.createDataFrame(
            [(2, 20, "x")], "id long, quantity bigint, note string"
        ),
        t,
    )
    out = evolved_read(spark, t)
    assert dict(out.dtypes) == {
        "id": "bigint", "quantity": "bigint", "note": "string"
    }
    rows = {r["id"]: (r["quantity"], r["note"]) for r in out.collect()}
    assert rows == {1: (10, None), 2: (20, "x")}
    # v0 files untouched on disk (old physical name + narrow type)
    v0 = spark.read.parquet(f"{t}/v=0")
    assert dict(v0.dtypes) == {"id": "bigint", "qty": "int"}


def test_schema_log_rename_widen_rename_chain_with_pushdown(spark, tmp):
    """Adversarial evolution: the SAME column renamed, widened, then
    renamed AGAIN across three on-disk vintages (physical names a/b/c,
    physical types int/int/bigint) — the oldest-first log replay must
    chain all three mappings per vintage. And the docstring's scale
    claim is proven, not assumed: a filter on the final column pushes
    into EVERY vintage's parquet scan through the union, each under
    the vintage's own PHYSICAL column name (Spark's cast-unwrapping
    makes the bigint comparison pushable into the int-typed scans)."""
    import contextlib
    import io

    from zcode_iceberg_spark.sources.sinks import (
        evolved_read,
        log_schema_action,
        write_snapshot,
    )

    t = str(tmp / "evo3")
    write_snapshot(spark.createDataFrame([(1, 10)], "id long, a int"), t)
    log_schema_action(t, "rename", from_name="a", to="b")
    write_snapshot(spark.createDataFrame([(2, 20)], "id long, b int"), t)
    log_schema_action(t, "widen", col="b", to="bigint")
    log_schema_action(t, "rename", from_name="b", to="c")
    write_snapshot(spark.createDataFrame([(3, 30)], "id long, c bigint"), t)

    out = evolved_read(spark, t)
    assert dict(out.dtypes) == {"id": "bigint", "c": "bigint"}
    assert {r["id"]: r["c"] for r in out.collect()} == {1: 10, 2: 20, 3: 30}
    # vintage files untouched: each keeps its physical name and type
    assert dict(spark.read.parquet(f"{t}/v=0").dtypes) == {"id": "bigint", "a": "int"}
    assert dict(spark.read.parquet(f"{t}/v=1").dtypes) == {"id": "bigint", "b": "int"}

    filtered = out.filter(F.col("c") > 15)
    assert {r["id"] for r in filtered.collect()} == {2, 3}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    p = buf.getvalue()
    for phys in ("a", "b", "c"):
        assert f"GreaterThan({phys},15)" in p, (phys, p)


def test_schema_log_rejects_malformed_actions(tmp):
    from zcode_iceberg_spark.sources.sinks import log_schema_action

    with pytest.raises(ValueError):
        log_schema_action(str(tmp / "x"), "rename", col="a", to="b")
    with pytest.raises(ValueError):
        log_schema_action(str(tmp / "x"), "drop", col="a")


def test_drawdown_state_step_matches_batch_query(spark, sf_dir, tmp_path):
    """Folding the ledger through the live risk table in two batch
    slices must land on exactly the final per-user row of the batch
    drawdown query — the exactness claim of the micro-unit carry."""
    from zcode_iceberg_spark.sources.sinks import drawdown_state_step
    from zcode_iceberg_spark.suite.stateful import (
        _decisions,
        q_ledger_drawdown,
    )
    from zcode_iceberg_spark.operators import stateful as st_ops

    led = st_ops.position_fsm(_decisions(spark, sf_dir))
    state = str(tmp_path / "risk_state")
    # slice by trade_seq: first two trades per user arrive in batch 1
    drawdown_state_step(spark, state, led.filter(F.col("trade_seq") <= 2))
    drawdown_state_step(spark, state, led.filter(F.col("trade_seq") > 2))
    got = {
        r["user_id"]: (r["eq_u"], r["peak_u"], r["n_trades"])
        for r in spark.read.parquet(state).collect()
    }

    dd = q_ledger_drawdown(spark, sf_dir).collect()
    last: dict = {}
    counts: dict = {}
    for r in dd:
        counts[r["user_id"]] = counts.get(r["user_id"], 0) + 1
        cur = last.get(r["user_id"])
        if cur is None or r["trade_seq"] > cur[0]:
            last[r["user_id"]] = (r["trade_seq"], r["equity"], r["peak"])
    assert set(got) == set(last)
    for uid, (_, eq, peak) in last.items():
        eq_u, peak_u, n = got[uid]
        assert abs(eq_u / 1e6 - eq) < 1e-12, uid
        assert abs(peak_u / 1e6 - peak) < 1e-12, uid
        assert n == counts[uid], uid


def test_drawdown_sink_streams_fsm_ledger(spark, sf_dir, tmp_path):
    """End-to-end: the foreachBatch sink over the STREAMED FSM ledger
    produces a state table covering every user the streaming FSM
    closed trades for, with equity equal to their closed-trade P&L sum
    (EOD close-outs stay open in streaming, so totals are compared
    against the stream's own emitted trades)."""
    import shutil

    from zcode_iceberg_spark.sources.sinks import drawdown_sink
    from zcode_iceberg_spark.streaming.pipeline import position_fsm_stream
    from zcode_iceberg_spark.suite.stateful import _decisions

    dec = _decisions(spark, sf_dir).select(
        "user_id", "ts", "event_id", "price", "z"
    )
    src = tmp_path / "dec_src"
    dec.write.parquet(str(src))
    stream = (
        spark.readStream.schema(dec.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ledger = position_fsm_stream(stream)
    state = str(tmp_path / "risk_state2")
    out = tmp_path / "ledger_out"
    q = drawdown_sink(ledger, state, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    st = spark.read.parquet(state).collect()
    assert st  # trades closed and the risk table exists
    for r in st:
        assert r["peak_u"] >= r["eq_u"]
        assert r["n_trades"] > 0


def test_route_by_flag_null_flag_is_exhaustive(spark, tmp_path):
    """A NULL flag must land in drop_dir (null-safe split): the two
    routes partition every input row — a scorer bug yielding NULL
    produces an auditable drop, never a vanished document. Also pins
    the kernel guard upstream: quality_filter on NULL text returns a
    non-NULL keep."""
    from zcode_iceberg_spark.operators import text as tx
    from zcode_iceberg_spark.sources.sinks import route_by_flag

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, True), (2, False), (3, None)], "doc_id long, keep boolean"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, keep boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    keep_dir, drop_dir = str(tmp_path / "keep"), str(tmp_path / "drop")
    route_by_flag(stream, keep_dir, drop_dir, str(tmp_path / "ck"))
    kept = {r["doc_id"] for r in spark.read.parquet(keep_dir).collect()}
    dropped = {r["doc_id"] for r in spark.read.parquet(drop_dir).collect()}
    assert kept == {1} and dropped == {2, 3}

    # kernel guard: NULL text scores deterministically, keep non-NULL
    d = spark.createDataFrame([(7, None)], "doc_id long, text string")
    row = tx.quality_filter(d).collect()[0]
    assert row["n_feats"] == 1 and row["keep"] is not None
