"""Streaming takedown queue: removal requests arriving as a stream
apply to a persisted ledger through the SAME tombstone seam as the
batch path (sources/sinks.py:ledger_delete), with no epoch
bookkeeping — tombstones are a grow-only set, so at-least-once replay
is a no-op by algebra, not by overwrite discipline.

Pins: (1) a drained request stream leaves the ledger's merge-on-read
view equal to the batch-built deleted state; (2) replaying the whole
queue (fresh checkpoint, same files) changes nothing; (3) the
incremental probe over the stream-deleted state matches the
registry's batch probe row-for-row.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.sinks import read_with_tombstones
from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.streaming.pipeline import ledger_delete_stream
from zcode_iceberg_spark.suite.llm import (
    _takedown_docs,
    build_incremental_hash_table,
    incremental_dedup_against,
    q_dedup_persisted_delete,
)


@pytest.fixture()
def tmp():
    d = Path(tempfile.mkdtemp(prefix="zspark_deltest_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain(spark, req_dir, ledger_dir, ck):
    q = ledger_delete_stream(
        spark, req_dir, "content_hash string", ledger_dir, "content_hash", ck
    )
    q.awaitTermination()


def test_stream_takedown_matches_batch_delete(spark, sf_dir, tmp):
    state = str(tmp / "hash_state")
    hash_dir, cut = build_incremental_hash_table(spark, sf_dir, state)
    d = load_table(spark, sf_dir, "documents")
    tomb = (
        _takedown_docs(d, cut)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .orderBy("content_hash")
        .collect()
    )
    assert len(tomb) > 1
    # the request queue: two files (two micro-batches), overlapping one
    # key across epochs — duplicate requests for the same content are
    # normal in a takedown queue and must be harmless
    half = len(tomb) // 2
    req = tmp / "requests"
    for i, part in enumerate((tomb[: half + 1], tomb[half:])):
        spark.createDataFrame(
            [(r["content_hash"],) for r in part], "content_hash string"
        ).coalesce(1).write.parquet(str(req / f"batch{i}"))
        f = next((req / f"batch{i}").glob("*.parquet"))
        f.rename(req / f"{i:03d}.parquet")
        shutil.rmtree(req / f"batch{i}")
    _drain(spark, str(req), hash_dir, str(tmp / "ck0"))

    got = sorted(
        r[0]
        for r in read_with_tombstones(spark, hash_dir, "content_hash")
        .select("content_hash")
        .collect()
    )
    purged = {r["content_hash"] for r in tomb}
    want = sorted(
        h
        for (h,) in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < cut)
        .select(F.md5("text"))
        .distinct()
        .collect()
        if h not in purged
    )
    assert got == want

    # full-queue replay (fresh checkpoint, same request files): the
    # sidecar is a set — nothing changes
    n_side = spark.read.parquet(hash_dir + "__tombstones").count()
    _drain(spark, str(req), hash_dir, str(tmp / "ck1"))
    assert spark.read.parquet(hash_dir + "__tombstones").count() == n_side
    got2 = sorted(
        r[0]
        for r in read_with_tombstones(spark, hash_dir, "content_hash")
        .select("content_hash")
        .collect()
    )
    assert got2 == want


def test_probe_over_stream_deleted_state_matches_registry(spark, sf_dir, tmp):
    """incremental probe reading the stream-deleted state via
    merge-on-read == the registry's batch probe (folded state)."""
    state = str(tmp / "hash_state")
    hash_dir, cut = build_incremental_hash_table(spark, sf_dir, state)
    d = load_table(spark, sf_dir, "documents")
    req = tmp / "requests"
    (
        _takedown_docs(d, cut)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .coalesce(1)
        .write.parquet(str(req))
    )
    _drain(spark, str(req), hash_dir, str(tmp / "ck"))
    # merge-on-read stand-in for the probe's ledger read
    mor_dir = str(tmp / "mor_ledger")
    read_with_tombstones(spark, hash_dir, "content_hash").write.parquet(
        mor_dir
    )
    got = {
        (r["doc_id"], r["content_hash"], r["is_kept"])
        for r in incremental_dedup_against(spark, sf_dir, mor_dir, cut).collect()
    }
    want = {
        (r["doc_id"], r["content_hash"], r["is_kept"])
        for r in q_dedup_persisted_delete(spark, sf_dir).collect()
    }
    assert got == want and got
