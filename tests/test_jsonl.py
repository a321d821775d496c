"""JSONL ingest/egress: lossless round-trip of the documents table,
corrupt-line quarantine, sharding, and gzip."""

from __future__ import annotations

import gzip
import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.jsonl import read_jsonl, write_jsonl
from zcode_iceberg_spark.sources.tables import load_table


@pytest.fixture()
def tmp():
    d = Path(tempfile.mkdtemp(prefix="zspark_jsonl_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _doc_map(df):
    return {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    }


def test_jsonl_round_trip_lossless(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, str(tmp / "out"), n_shards=4)
    files = [p for p in (tmp / "out").iterdir() if p.name.startswith("part-")]
    assert len(files) == 4
    valid, corrupt = read_jsonl(spark, str(tmp / "out"))
    assert corrupt.count() == 0
    assert _doc_map(valid) == _doc_map(docs)


def test_jsonl_gzip_shards_round_trip(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, str(tmp / "gz"), n_shards=2, compress=True)
    gz = [p for p in (tmp / "gz").iterdir() if p.suffix == ".gz"]
    assert len(gz) == 2
    # each shard is independently decompressible (dataloader contract)
    with gzip.open(gz[0], "rt") as f:
        assert f.readline().startswith("{")
    valid, corrupt = read_jsonl(spark, str(tmp / "gz"))
    assert corrupt.count() == 0
    assert _doc_map(valid) == _doc_map(docs)


def test_jsonl_corrupt_lines_quarantined(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    write_jsonl(docs, str(tmp / "c"), n_shards=1)
    # a truncated shard arrives as its own file (don't append to a file
    # Spark already wrote in-session: its cached file-status would lie)
    with open(tmp / "c" / "part-corrupt.json", "w") as f:
        f.write('{"doc_id": 999999, "text": "truncated\n')
        f.write("not json at all\n")
    valid, corrupt = read_jsonl(spark, str(tmp / "c"))
    assert valid.count() == 5
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert len(bad) == 2
    assert "not json at all" in bad
    # valid rows are untouched by the quarantine
    assert _doc_map(valid) == _doc_map(docs)


def test_jsonl_strict_mode_fails_loudly(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").limit(3)
    write_jsonl(docs, str(tmp / "s"), n_shards=1)
    with open(tmp / "s" / "part-garbage.json", "w") as f:
        f.write("garbage line\n")
    valid, _ = read_jsonl(spark, str(tmp / "s"), strict=True)
    with pytest.raises(Exception, match="FAILFAST|Malformed|MALFORMED"):
        valid.count()


def test_jsonl_feeds_the_pipeline(spark, sf_dir, tmp):
    """A JSONL corpus drops into the same operators the parquet table
    feeds — e.g. exact dedup over content hashes."""
    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, str(tmp / "p"), n_shards=2)
    valid, _ = read_jsonl(spark, str(tmp / "p"))
    want = docs.select(F.md5("text").alias("h")).distinct().count()
    got = valid.select(F.md5("text").alias("h")).distinct().count()
    assert got == want > 0


def test_jsonl_stream_matches_batch(spark, sf_dir, tmp):
    """Duality: streaming the JSONL shards yields exactly the batch
    read's rows, corrupt lines included as quarantine rows."""
    from zcode_iceberg_spark.sources.jsonl import stream_jsonl
    from zcode_iceberg_spark.streaming.pipeline import run_available_now

    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, str(tmp / "st"), n_shards=3)
    with open(tmp / "st" / "part-bad.json", "w") as f:
        f.write("broken {\n")
    st = stream_jsonl(spark, str(tmp / "st"))
    run_available_now(st, str(tmp / "st_out"), str(tmp / "st_ck"))
    out = spark.read.parquet(str(tmp / "st_out"))
    valid = out.filter(F.col("_corrupt_record").isNull())
    corrupt = out.filter(F.col("_corrupt_record").isNotNull())
    assert corrupt.count() == 1
    assert _doc_map(valid) == _doc_map(docs)


def test_jsonl_quarantine_routing_sink(spark, sf_dir, tmp):
    """route_quarantine is format-agnostic: the same sink that splits
    the CSV stream routes a corrupt JSONL shard to the quarantine
    table with the batch read's exact rows."""
    from zcode_iceberg_spark.sources.jsonl import stream_jsonl
    from zcode_iceberg_spark.sources.sinks import route_quarantine

    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, str(tmp / "rq"), n_shards=2)
    with open(tmp / "rq" / "part-bad.json", "w") as f:
        f.write('{"doc_id": "not-a-long"\n')
    st = stream_jsonl(spark, str(tmp / "rq"))
    route_quarantine(
        st, str(tmp / "rq_valid"), str(tmp / "rq_bad"), str(tmp / "rq_ck")
    )
    got_valid = spark.read.parquet(str(tmp / "rq_valid")).drop("batch_id")
    got_bad = spark.read.parquet(str(tmp / "rq_bad"))
    assert sorted(got_bad.columns) == ["batch_id", "raw_line"]
    assert got_bad.count() == 1
    assert _doc_map(got_valid) == _doc_map(docs)


def test_jsonl_property_round_trip_any_text(spark, tmp):
    """Hypothesis: JSONL round-trips ANY string content — newlines,
    quotes, backslashes, control chars, unicode — because JSON escapes
    them (the reason JSONL is the default corpus interchange)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
        ]
    )
    txt = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=25
    )

    @settings(max_examples=10, deadline=None)
    @given(rows=st.lists(st.tuples(txt, txt), min_size=1, max_size=8))
    def check(rows):
        import uuid

        data = [(i, a, b) for i, (a, b) in enumerate(rows)]
        d = tmp / f"prop_{uuid.uuid4().hex[:8]}"
        df = spark.createDataFrame(data, schema).coalesce(1)
        write_jsonl(df, str(d))
        valid, corrupt = read_jsonl(spark, str(d), schema)
        # JSON writers drop null-valued keys; '' round-trips exactly,
        # so only None-vs-absent needs normalizing — and hypothesis
        # never generates None here, so compare exactly
        got = sorted((r["id"], r["a"], r["b"]) for r in valid.collect())
        assert corrupt.count() == 0
        assert got == sorted(data)

    check()
