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


def test_ann_stream_state_feeds_incremental_query_across_restart(
    spark, sf_dir, tmp_path
):
    """VERDICT r8 #8: streamed IVF ingest → persisted index →
    incremental ANN QUERY, across a restart. The index built by
    ann_index_stream over the historical vectors — two shards,
    drained, then a third landed and the stream RESTARTED on the same
    checkpoint — must drive incremental_ann_against to the exact rows
    the registry query (q_ann_ivf_incremental_persisted's path over
    the batch-built state) produces."""
    import os
    import shutil
    import time
    from pathlib import Path

    from zcode_iceberg_spark.suite.llm import incremental_ann_against

    state = str(tmp_path / "ivf_state")
    cents_dir, assign_dir, cut = build_ivf_state(spark, sf_dir, state)
    hist = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < cut
    )
    src = tmp_path / "src"
    src.mkdir()

    def land(i):
        sub = tmp_path / f"shard{i}"
        hist.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            str(sub)
        )
        f = next(Path(sub).glob("*.parquet"))
        dst = src / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    index_dir = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    land(0)
    land(1)
    assert ann_index_stream(spark, str(src), cents_dir, index_dir, ck
                            ).awaitTermination(120)
    n1 = len(_index_rows(spark, index_dir))
    land(2)
    assert ann_index_stream(spark, str(src), cents_dir, index_dir, ck
                            ).awaitTermination(120)  # restart resumes
    rows = _index_rows(spark, index_dir)
    assert len(rows) > n1  # the restarted run really ingested shard 2
    assert rows == _index_rows(spark, assign_dir)

    # resolve the epoch-partitioned streamed index to the live view the
    # query path reads, landed as a flat table (the compaction step)
    from zcode_iceberg_spark.streaming.pipeline import ann_index_state

    resolved_dir = str(tmp_path / "index_resolved")
    ann_index_state(spark, index_dir).write.parquet(resolved_dir)
    index_dir = resolved_dir

    def topk(dir_):
        return sorted(
            (r["qid"], r["rank"], r["nid"], r["cell"], round(r["cos_sim"], 6))
            for r in incremental_ann_against(
                spark, sf_dir, cents_dir, dir_, cut
            ).collect()
        )

    got = topk(index_dir)
    want = topk(assign_dir)  # the oracle-checked registry query's path
    assert got == want and got
