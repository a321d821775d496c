"""CSV ingest/egress: lossless round-trip of the documents table
(including quoted delimiters/quotes in text), corrupt-row quarantine,
header handling, sharding, gzip, and the streaming twin."""

from __future__ import annotations

import gzip
import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zcode_iceberg_spark.sources.csvio import read_csv, write_csv
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


@pytest.fixture()
def tmp():
    d = Path(tempfile.mkdtemp(prefix="zspark_csv_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, sf_dir):
    # CSV records are lines by contract: embedded newlines are out of
    # scope (multiline records break file splitting at scale), so the
    # fixture normalizes them the way a CSV-shipping corpus would
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace("text", "[\\n\\r]", " ").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )


def _doc_map(df):
    return {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    }


def test_csv_round_trip_lossless(spark, sf_dir, tmp):
    docs = _docs(spark, sf_dir)
    write_csv(docs, str(tmp / "out"), n_shards=4)
    files = [p for p in (tmp / "out").iterdir() if p.name.startswith("part-")]
    assert len(files) == 4
    valid, corrupt = read_csv(spark, str(tmp / "out"), DOC_SCHEMA)
    assert corrupt.count() == 0
    assert _doc_map(valid) == _doc_map(docs)


def test_csv_quoting_survives_delimiters(spark, tmp):
    """Fields containing the delimiter, quotes, or leading spaces must
    round-trip through RFC-4180 quoting."""
    rows = [
        (1, 'a,b "quoted", c', "en", "web", 15),
        (2, "plain", "de", "books,extra", 5),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    write_csv(df, str(tmp / "q"), n_shards=1)
    valid, corrupt = read_csv(spark, str(tmp / "q"), DOC_SCHEMA)
    assert corrupt.count() == 0
    assert _doc_map(valid) == _doc_map(df)


def test_csv_gzip_shards_round_trip(spark, sf_dir, tmp):
    docs = _docs(spark, sf_dir)
    write_csv(docs, str(tmp / "gz"), n_shards=2, compress=True)
    gz = [p for p in (tmp / "gz").iterdir() if p.suffix == ".gz"]
    assert len(gz) == 2
    with gzip.open(gz[0], "rt") as f:
        assert f.readline().startswith("doc_id")  # per-shard header
    valid, corrupt = read_csv(spark, str(tmp / "gz"), DOC_SCHEMA)
    assert corrupt.count() == 0
    assert _doc_map(valid) == _doc_map(docs)


def test_csv_corrupt_rows_quarantined(spark, sf_dir, tmp):
    docs = _docs(spark, sf_dir).limit(5)
    write_csv(docs, str(tmp / "c"), n_shards=1)
    with open(tmp / "c" / "part-corrupt.csv", "w") as f:
        f.write("not-a-long,text here,en,web,also-not-a-long\n")
    valid, corrupt = read_csv(spark, str(tmp / "c"), DOC_SCHEMA)
    assert valid.count() == 5
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert bad == ["not-a-long,text here,en,web,also-not-a-long"]
    assert _doc_map(valid) == _doc_map(docs)


def test_csv_strict_mode_fails_loudly(spark, sf_dir, tmp):
    docs = _docs(spark, sf_dir).limit(3)
    write_csv(docs, str(tmp / "s"), n_shards=1)
    with open(tmp / "s" / "part-garbage.csv", "w") as f:
        f.write("garbage,line,x,y,z\n")
    valid, _ = read_csv(spark, str(tmp / "s"), DOC_SCHEMA, strict=True)
    with pytest.raises(Exception, match="FAILFAST|Malformed|MALFORMED"):
        valid.count()


def test_csv_stream_matches_batch(spark, sf_dir, tmp):
    """Duality: streaming the CSV shards yields exactly the batch
    read's rows, corrupt rows included as quarantine rows."""
    from zcode_iceberg_spark.sources.csvio import stream_csv
    from zcode_iceberg_spark.streaming.pipeline import run_available_now

    docs = _docs(spark, sf_dir)
    write_csv(docs, str(tmp / "st"), n_shards=3)
    with open(tmp / "st" / "part-bad.csv", "w") as f:
        f.write("broken,row,only\n")
    st = stream_csv(spark, str(tmp / "st"), DOC_SCHEMA)
    run_available_now(st, str(tmp / "st_out"), str(tmp / "st_ck"))
    out = spark.read.parquet(str(tmp / "st_out"))
    valid = out.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = out.filter(F.col("_corrupt_record").isNotNull())
    assert corrupt.count() == 1
    assert _doc_map(valid) == _doc_map(docs)


def test_csv_quarantine_routing_sink(spark, sf_dir, tmp):
    """The sink the stream_csv docstring promises: foreachBatch routes
    clean rows to the valid table and malformed raw lines to the
    quarantine table — and both match the batch read's exact rows."""
    from zcode_iceberg_spark.sources.csvio import stream_csv
    from zcode_iceberg_spark.sources.sinks import route_quarantine

    docs = _docs(spark, sf_dir)
    write_csv(docs, str(tmp / "rq"), n_shards=3)
    with open(tmp / "rq" / "part-bad.csv", "w") as f:
        f.write("broken,row,only\n")
        f.write("also-not-a-long,t,en,web,nope\n")
    st = stream_csv(spark, str(tmp / "rq"), DOC_SCHEMA)
    route_quarantine(
        st, str(tmp / "rq_valid"), str(tmp / "rq_bad"), str(tmp / "rq_ck")
    )
    batch_valid, batch_corrupt = read_csv(spark, str(tmp / "rq"), DOC_SCHEMA)
    got_valid = spark.read.parquet(str(tmp / "rq_valid")).drop("batch_id")
    got_bad = spark.read.parquet(str(tmp / "rq_bad"))
    assert sorted(got_bad.drop("batch_id").columns) == ["raw_line"]
    assert sorted(r["raw_line"] for r in got_bad.collect()) == sorted(
        r["raw_line"] for r in batch_corrupt.collect()
    )
    assert _doc_map(got_valid) == _doc_map(batch_valid)

    # replay idempotency: a fresh checkpoint re-delivers every batch
    # (foreachBatch at-least-once); the batch_id-keyed overwrite must
    # land on the same partitions instead of appending duplicates
    bad_count = got_bad.count()  # before replay invalidates its files
    st2 = stream_csv(spark, str(tmp / "rq"), DOC_SCHEMA)
    route_quarantine(
        st2, str(tmp / "rq_valid"), str(tmp / "rq_bad"), str(tmp / "rq_ck2")
    )
    again_valid = spark.read.parquet(str(tmp / "rq_valid")).drop("batch_id")
    again_bad = spark.read.parquet(str(tmp / "rq_bad"))
    assert again_bad.count() == bad_count
    assert _doc_map(again_valid) == _doc_map(batch_valid)


def test_csv_property_round_trip_adversarial_strings(spark, tmp):
    """Hypothesis: any in-contract string content (no newlines; quotes,
    delimiters, unicode, leading/trailing spaces all allowed) survives
    write_csv -> read_csv exactly, and strict mode agrees."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
        ]
    )
    # printable-ish minus newlines (out of contract) — includes the
    # delimiter, double quotes, backslashes, and non-ASCII
    txt = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\r\n"
        ),
        max_size=25,
    )

    @settings(max_examples=10, deadline=None)
    @given(rows=st.lists(st.tuples(txt, txt), min_size=1, max_size=8))
    def check(rows):
        import uuid

        data = [(i, a, b) for i, (a, b) in enumerate(rows)]
        d = tmp / f"prop_{uuid.uuid4().hex[:8]}"
        df = spark.createDataFrame(data, schema).coalesce(1)
        write_csv(df, str(d))
        valid, corrupt = read_csv(spark, str(d), schema)
        # Spark's CSV writer emits NULL for the empty string (they are
        # indistinguishable in unquoted CSV) — normalize both sides
        norm = lambda v: v if v else ""
        got = sorted(
            (r["id"], norm(r["a"]), norm(r["b"])) for r in valid.collect()
        )
        want = sorted((i, norm(a), norm(b)) for i, a, b in data)
        assert corrupt.count() == 0
        assert got == want
        strict, _ = read_csv(spark, str(d), schema, strict=True)
        got2 = sorted(
            (r["id"], norm(r["a"]), norm(r["b"])) for r in strict.collect()
        )
        assert got2 == want

    check()
