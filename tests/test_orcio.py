"""ORC ingest/egress: lossless round-trip of the documents table,
sharding, compression, predicate-pushdown parity with parquet, and
the streaming twin."""

from __future__ import annotations

import contextlib
import io
import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zcode_iceberg_spark.sources.orcio import read_orc, stream_orc, write_orc
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
    d = Path(tempfile.mkdtemp(prefix="zspark_orc_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _doc_map(df):
    return {r["doc_id"]: tuple(r[c] for c in COLS[1:]) for r in df.collect()}


def test_orc_round_trip_lossless(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_orc(docs, str(tmp / "out"), n_shards=4)
    files = [p for p in (tmp / "out").iterdir() if p.name.startswith("part-")]
    assert len(files) == 4
    got = read_orc(spark, str(tmp / "out"), DOC_SCHEMA)
    assert _doc_map(got) == _doc_map(docs)


def test_orc_predicate_pushdown_parity(spark, sf_dir, tmp):
    """The parity claim in the module docstring, proven: a filter on
    the ORC scan surfaces as a pushed search argument and the
    projection prunes unread columns."""
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_orc(docs, str(tmp / "pd"), n_shards=2)
    q = (
        read_orc(spark, str(tmp / "pd"), DOC_SCHEMA)
        .where(F.col("n_chars") > 500)
        .select("doc_id", "lang")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    p = buf.getvalue()
    assert "PushedFilters" in p and "n_chars" in p.split("PushedFilters", 1)[1]
    # column pruning: the wide text column never leaves the scan
    assert "ReadSchema" in p and "text" not in p.split("ReadSchema", 1)[1]
    want = docs.where(F.col("n_chars") > 500).count()
    assert q.count() == want > 0


def test_orc_stream_matches_batch(spark, sf_dir, tmp):
    from zcode_iceberg_spark.streaming.pipeline import run_available_now

    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_orc(docs, str(tmp / "st"), n_shards=3)
    st = stream_orc(spark, str(tmp / "st"), DOC_SCHEMA)
    run_available_now(st, str(tmp / "st_out"), str(tmp / "st_ck"))
    got = spark.read.parquet(str(tmp / "st_out"))
    assert _doc_map(got) == _doc_map(docs)


def test_orc_property_round_trip_any_text(spark, tmp):
    """Hypothesis: ORC (binary columnar) round-trips ANY string
    content — newlines, quotes, control chars, unicode — exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

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

    @settings(max_examples=8, deadline=None)
    @given(rows=st.lists(st.tuples(txt, txt), min_size=1, max_size=8))
    def check(rows):
        import uuid

        data = [(i, a, b) for i, (a, b) in enumerate(rows)]
        d = tmp / f"prop_{uuid.uuid4().hex[:8]}"
        df = spark.createDataFrame(data, schema).coalesce(1)
        write_orc(df, str(d))
        got = sorted(
            (r["id"], r["a"], r["b"])
            for r in read_orc(spark, str(d), schema).collect()
        )
        assert got == sorted(data)

    check()
