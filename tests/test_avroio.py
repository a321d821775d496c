"""Avro ingest/egress (sources/avroio.py): spec-conformant byte
encoding, lossless round-trip under both codecs, loud failure on
schema drift and block corruption, and the streaming twin."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zcode_iceberg_spark.sources.avroio import (
    MAGIC,
    _encode_block,
    _schema_kinds,
    _zigzag,
    avro_schema,
    decode_container,
    read_avro,
    stream_avro,
    write_avro,
)
from zcode_iceberg_spark.sources.tables import load_table

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)
COLS = [f.name for f in DOC_SCHEMA.fields]


@pytest.fixture()
def tmp():
    d = Path(tempfile.mkdtemp(prefix="zspark_avro_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _doc_map(df):
    return {r["doc_id"]: tuple(r[c] for c in COLS[1:]) for r in df.collect()}


def test_zigzag_varint_spec_bytes():
    """Byte-level spec conformance (Avro 1.11 §primitive encodings):
    the canonical zigzag examples plus multi-byte continuation."""
    assert _zigzag(0) == b"\x00"
    assert _zigzag(-1) == b"\x01"
    assert _zigzag(1) == b"\x02"
    assert _zigzag(-2) == b"\x03"
    assert _zigzag(2) == b"\x04"
    assert _zigzag(-64) == b"\x7f"
    assert _zigzag(64) == b"\x80\x01"
    assert MAGIC == b"Obj\x01"


def test_codec_unit_round_trip_all_types():
    schema = T.StructType(
        [
            T.StructField("l", T.LongType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("fl", T.FloatType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("s", T.StringType()),
            T.StructField("by", T.BinaryType()),
        ]
    )
    rec = avro_schema(schema)
    kinds = _schema_kinds(rec)
    rows = [
        (1, -2, 3.5, 0.25, True, "héllo", b"\x00\xff"),
        (None, None, None, None, None, None, None),
        (-(2**40), 2**30, -1e-9, 2.0, False, "", b""),
    ]
    from zcode_iceberg_spark.sources.avroio import _container_header

    for codec in ("null", "deflate"):
        buf = _container_header(rec, codec) + _encode_block(rows, kinds, codec)
        got_rec, got_rows = decode_container(buf)
        assert got_rec == rec
        assert list(got_rows()) == rows


def test_avro_large_longs_with_nulls_round_trip(spark, tmp):
    """The pandas float64 trap, pinned: an int64 column that contains
    a NULL in the same batch as values above 2^53 must round-trip
    bit-exactly (the Arrow-side encode path never hops through a
    lossy float)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = [
        (2**53 + 1, "a"),  # not representable in float64
        (None, "b"),
        (-(2**62) - 7, "c"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    write_avro(df, str(tmp / "big"), codec="null")
    got = sorted(
        ((r["id"], r["s"]) for r in read_avro(spark, str(tmp / "big"), schema).collect()),
        key=str,
    )
    assert got == sorted(rows, key=str)


def test_avro_nan_round_trips_as_nan(spark, tmp):
    """A genuine NaN double must come back as NaN, never become null
    (NaN-vs-null distinction is part of lossless)."""
    import math

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, float("nan")), (2, None), (3, 1.5)], schema
    ).coalesce(1)
    write_avro(df, str(tmp / "nan"), codec="null")
    got = {r["id"]: r["x"] for r in read_avro(spark, str(tmp / "nan"), schema).collect()}
    assert math.isnan(got[1])
    assert got[2] is None
    assert got[3] == 1.5


def test_avro_timestamps_survive_non_utc_session(spark, tmp):
    """Timestamps are ABSOLUTE instants: a round-trip under a non-UTC
    session timezone must not shift them by the tz offset (the micros
    are UTC; the decode column is tz-aware so Spark cannot
    re-interpret naive wall-clock in session-local time)."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    want = dt.datetime(2024, 6, 1, 12, 0, 0)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        df = spark.createDataFrame([(1, want)], schema).coalesce(1)
        write_avro(df, str(tmp / "tz"), codec="null")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = read_avro(spark, str(tmp / "tz"), schema).collect()[0]["ts"]
        # collect() renders the internal instant in the DRIVER's local
        # tz (UTC on this host), so a correct round-trip is exactly
        # the written value; the pre-fix naive decode re-interpreted
        # 12:00 as NY wall clock and came back as 16:00 (+4h shift)
        assert got == want
        spark.conf.set("spark.sql.session.timeZone", prev)
        again = read_avro(spark, str(tmp / "tz"), schema).collect()[0]["ts"]
        assert again == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_avro_round_trip_lossless(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    n = write_avro(docs, str(tmp / "out"), n_shards=4)
    assert n == 4
    files = sorted(p.name for p in (tmp / "out").iterdir())
    assert files == [f"part-{i:05d}.avro" for i in range(4)]
    got = read_avro(spark, str(tmp / "out"), DOC_SCHEMA)
    assert got.schema == DOC_SCHEMA
    assert _doc_map(got) == _doc_map(docs)


def test_avro_null_codec_and_timestamps(spark, sf_dir, tmp):
    from zcode_iceberg_spark.sources.tables import events_ticks

    ticks = events_ticks(spark, sf_dir).select(
        "event_id", "user_id", "ts", "price"
    ).limit(500)
    schema = ticks.schema
    write_avro(ticks, str(tmp / "tk"), n_shards=2, codec="null")
    got = read_avro(spark, str(tmp / "tk"), schema)
    a = {r["event_id"]: (r["user_id"], r["ts"], r["price"]) for r in got.collect()}
    b = {
        r["event_id"]: (r["user_id"], r["ts"], r["price"])
        for r in ticks.collect()
    }
    assert a == b


def test_avro_schema_drift_fails_loudly(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_avro(docs, str(tmp / "drift"), n_shards=1)
    wrong = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    with pytest.raises(Exception, match="does not match declared"):
        read_avro(spark, str(tmp / "drift"), wrong).collect()


def test_avro_corrupt_block_fails_loudly(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select(*COLS).limit(50)
    write_avro(docs, str(tmp / "cor"), n_shards=1)
    f = tmp / "cor" / "part-00000.avro"
    raw = bytearray(f.read_bytes())
    raw[-8] ^= 0xFF  # flip a sync-marker byte of the last block
    f.write_bytes(bytes(raw))
    with pytest.raises(Exception, match="sync-marker mismatch"):
        read_avro(spark, str(tmp / "cor"), DOC_SCHEMA).collect()


def test_avro_stream_matches_batch(spark, sf_dir, tmp):
    from zcode_iceberg_spark.streaming.pipeline import run_available_now

    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_avro(docs, str(tmp / "st"), n_shards=3)
    st = stream_avro(spark, str(tmp / "st"), DOC_SCHEMA)
    run_available_now(st, str(tmp / "st_out"), str(tmp / "st_ck"))
    got = spark.read.parquet(str(tmp / "st_out"))
    assert _doc_map(got) == _doc_map(docs)


def test_avro_strict_read_fails_loudly_on_bad_shard(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_avro(docs, str(tmp / "q"), n_shards=2)
    bad = tmp / "q" / "part-99999.avro"
    bad.write_bytes(b"not avro at all")
    with pytest.raises(Exception, match="not an Avro object container"):
        read_avro(spark, str(tmp / "q"), DOC_SCHEMA).collect()


def test_avro_quarantine_read_routes_bad_shards(spark, sf_dir, tmp):
    """The line-format quarantine contract at this format's corruption
    granularity: a bad shard becomes one (path, error) row, healthy
    shards' rows flow through exactly."""
    from zcode_iceberg_spark.sources.avroio import read_avro_quarantine

    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_avro(docs, str(tmp / "qq"), n_shards=2)
    (tmp / "qq" / "part-99998.avro").write_bytes(b"garbage bytes")
    # and a sync-corrupted real shard
    f = tmp / "qq" / "part-00001.avro"
    raw = bytearray(f.read_bytes())
    raw[-4] ^= 0xFF
    f.write_bytes(bytes(raw))
    valid, corrupt = read_avro_quarantine(spark, str(tmp / "qq"), DOC_SCHEMA)
    bad = {r["path"].split("/")[-1]: r["error"] for r in corrupt.collect()}
    assert set(bad) == {"part-99998.avro", "part-00001.avro"}
    assert "not an Avro object container" in bad["part-99998.avro"]
    assert "sync-marker mismatch" in bad["part-00001.avro"]
    # the surviving shard's rows are exactly the batch read of shard 0
    want = {
        r["doc_id"]
        for r in read_avro(
            spark, str(tmp / "qq" / "part-00000.avro"), DOC_SCHEMA
        ).collect()
    }
    assert {r["doc_id"] for r in valid.collect()} == want


def test_avro_codec_property_round_trip():
    """Hypothesis: ANY row set of the supported types survives
    encode→decode bit-exactly under both codecs (the hand-written
    binary codec's correctness surface)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = T.StructType(
        [
            T.StructField("l", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("s", T.StringType()),
            T.StructField("by", T.BinaryType()),
        ]
    )
    from zcode_iceberg_spark.sources.avroio import (
        _container_header,
        _encode_block,
    )

    rec = avro_schema(schema)
    kinds = _schema_kinds(rec)
    row = st.tuples(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, width=64),
        ),
        st.one_of(st.none(), st.booleans()),
        st.one_of(st.none(), st.text(max_size=60)),
        st.one_of(st.none(), st.binary(max_size=60)),
    )

    @settings(max_examples=150, deadline=None)
    @given(rows=st.lists(row, max_size=25), codec=st.sampled_from(["null", "deflate"]))
    def check(rows, codec):
        buf = _container_header(rec, codec)
        if rows:
            buf += _encode_block(rows, kinds, codec)
        got_rec, got_rows = decode_container(buf)
        assert got_rec == rec
        assert list(got_rows()) == rows

    check()
