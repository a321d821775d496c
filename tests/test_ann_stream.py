"""Streaming IVF ingest (streaming/pipeline.py:ann_index_stream):
stream ≡ batch agreement with the persisted-index build, and the
epoch-keyed-overwrite idempotence claim under foreachBatch replay.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.streaming.pipeline import (
    ann_index_step,
    ann_index_stream,
)
from zcode_iceberg_spark.suite.llm import build_ivf_state


def _index_rows(spark, index_dir):
    return sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(index_dir).collect()
    )


def test_ann_index_stream_matches_batch_build(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ivf_state")
    cents_dir, assign_dir, cut = build_ivf_state(spark, sf_dir, state)

    # feed the HISTORICAL vectors as 3 shards — the same population the
    # batch build indexed
    hist = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < cut
    )
    src = str(tmp_path / "src")
    for i in range(3):
        hist.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    index_dir = str(tmp_path / "index")
    q = ann_index_stream(
        spark, src, cents_dir, index_dir, str(tmp_path / "ck")
    )
    assert q.awaitTermination(120), "stream timed out"

    got = _index_rows(spark, index_dir)
    want = _index_rows(spark, assign_dir)
    assert got == want and got


def test_ann_index_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ivf_state2")
    cents_dir, assign_dir, cut = build_ivf_state(spark, sf_dir, state)
    batch = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < cut
    )
    index_dir = str(tmp_path / "index2")
    ann_index_step(batch, 0, cents_dir, index_dir)
    first = _index_rows(spark, index_dir)
    # a crash-replayed epoch rewrites its own partition, never appends
    ann_index_step(batch, 0, cents_dir, index_dir)
    spark.catalog.refreshByPath(index_dir)
    assert _index_rows(spark, index_dir) == first and first
