"""Tombstone deletion for the persisted-ingest-state family.

Pins the takedown/PII-removal contract (VERDICT r11 #7):
(1) ``ledger_delete`` is replay-idempotent — re-applying the same
    tombstone keys leaves the sidecar (and any later fold) unchanged;
(2) merge-on-read (``read_with_tombstones``) and the folded rewrite
    (``fold_tombstones``) agree exactly, and the fold consumes the
    sidecar (no retained fingerprints of purged content);
(3) probe-after-delete semantics: content whose only historical match
    was purged reads as NOVEL again in the exact-hash probe, taken-down
    docs can never seed LSH candidates, and purged windows stop marking
    batch positions as duplicated.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.sinks import (
    fold_tombstones,
    ledger_delete,
    read_with_tombstones,
)
from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite.llm import (
    TAKEDOWN_MOD,
    _takedown_docs,
    build_hash_state_deleted,
    build_incremental_hash_table,
    build_neardup_state_deleted,
    build_substr_state_deleted,
    incremental_dedup_against,
    incremental_neardup_against,
    q_dedup_incremental_persisted,
    substring_dedup_against,
)


def _hashes(spark, path):
    return sorted(r[0] for r in spark.read.parquet(path).select("content_hash").collect())


def test_delete_replay_idempotent_and_fold_consumes(spark, sf_dir, tmp_path):
    state = str(tmp_path / "hash_state")
    hash_dir, cut = build_incremental_hash_table(spark, sf_dir, state)
    d = load_table(spark, sf_dir, "documents")
    tomb = _takedown_docs(d, cut).select(F.md5("text").alias("content_hash"))

    tomb_dir = ledger_delete(spark, hash_dir, tomb, "content_hash")
    n1 = spark.read.parquet(tomb_dir).count()
    # replay the SAME delete epoch: sidecar unchanged (set semantics)
    ledger_delete(spark, hash_dir, tomb, "content_hash")
    assert spark.read.parquet(tomb_dir).count() == n1

    # merge-on-read == the later fold, row for row
    mor = sorted(
        r[0]
        for r in read_with_tombstones(spark, hash_dir, "content_hash")
        .select("content_hash")
        .collect()
    )
    assert fold_tombstones(spark, hash_dir, "content_hash") is True
    assert _hashes(spark, hash_dir) == mor
    # the sidecar is consumed — no retained delete log of purged keys
    assert not Path(tomb_dir).exists()
    # second fold is a no-op (nightly maintenance is idempotent)
    assert fold_tombstones(spark, hash_dir, "content_hash") is False
    assert _hashes(spark, hash_dir) == mor


def test_folded_equals_rebuild_minus_takedown(spark, sf_dir, tmp_path):
    """The folded exact-hash ledger holds exactly the historical hashes
    minus the purged content's hashes — same as a from-scratch rebuild
    over the surviving semantics."""
    state = str(tmp_path / "hash_del")
    hash_dir, cut = build_hash_state_deleted(spark, sf_dir, state)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < cut)
    purged = {
        r[0]
        for r in _takedown_docs(d, cut)
        .select(F.md5("text"))
        .distinct()
        .collect()
    }
    want = sorted(
        h
        for (h,) in d.select(F.md5("text")).distinct().collect()
        if h not in purged
    )
    assert _hashes(spark, hash_dir) == want


def test_exact_probe_flips_purged_only_matches(spark, sf_dir, tmp_path):
    """A new-batch doc whose ONLY historical match was purged flips
    is_kept False→True; no kept doc flips the other way (deletes can
    only make content more novel)."""
    state = str(tmp_path / "hash_del_probe")
    hash_dir, cut = build_hash_state_deleted(spark, sf_dir, state)
    after = {
        r["doc_id"]: r["is_kept"]
        for r in incremental_dedup_against(spark, sf_dir, hash_dir, cut).collect()
    }
    before = {
        r["doc_id"]: r["is_kept"]
        for r in q_dedup_incremental_persisted(spark, sf_dir).collect()
    }
    assert set(after) == set(before)
    assert all(after[i] or not before[i] for i in before)  # monotone
    # flips happen EXACTLY for batch docs that are first-in-batch for
    # their hash and whose historical matches were all purged
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", F.md5("text").alias("h"))
    # a hash flips iff NO surviving historical doc carries it but SOME
    # purged doc does
    hist = hashed.filter(F.col("doc_id") < cut)
    surv = hist.filter(F.col("doc_id") % TAKEDOWN_MOD != 0).select("h").distinct()
    purg = hist.filter(F.col("doc_id") % TAKEDOWN_MOD == 0).select("h").distinct()
    flip_h = {r[0] for r in purg.join(surv, "h", "left_anti").collect()}
    batch = hashed.filter(F.col("doc_id") >= cut)
    wmin = (
        batch.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    )
    expect_flips = {
        r["first_id"]
        for r in wmin.collect()
        if r["h"] in flip_h
    }
    got_flips = {i for i in before if after[i] and not before[i]}
    assert got_flips == expect_flips


def test_neardup_probe_never_scores_taken_down_docs(spark, sf_dir, tmp_path):
    state = str(tmp_path / "lsh_del")
    bands_dir, sigs_dir, cut = build_neardup_state_deleted(spark, sf_dir, state)
    # no band/sig rows for taken-down ids survive the fold
    for p in (bands_dir, sigs_dir):
        n_bad = (
            spark.read.parquet(p)
            .filter(F.col("doc_id") % TAKEDOWN_MOD == 0)
            .count()
        )
        assert n_bad == 0
    got = incremental_neardup_against(spark, sf_dir, bands_dir, sigs_dir, cut)
    assert got.count() > 0  # probe still runs over the full batch


def test_fold_crash_between_steps_leaves_readable_ledger(
    spark, tmp_path, monkeypatch
):
    """Kill-between-steps audit of the fold's swap (VERDICT r12 #8):
    simulate a crash before EACH filesystem mutation of
    ``fold_tombstones``'s swap sequence (rename-aside, rename-in, drop
    old, drop sidecar) and assert that (a) a readable, semantically
    correct ledger survives every crash point — merge-on-read returns
    the folded row set from old-at-path, old-at-aside (recovered), or
    new-at-path alike — and (b) re-running the fold converges to the
    same final state as the crash-free run."""
    import shutil
    from pathlib import Path as RealPath

    import zcode_iceberg_spark.sources.sinks as sinks

    def fresh_ledger(tag):
        path = str(tmp_path / f"ledger_{tag}")
        spark.range(100).selectExpr("id AS k", "id * 2 AS v").write.parquet(path)
        tombs = spark.range(0, 100, 3).selectExpr("id AS k")
        ledger_delete(spark, path, tombs, "k")
        return path

    def surviving_keys(path):
        return sorted(
            r[0] for r in read_with_tombstones(spark, path, "k").select("k").collect()
        )

    expected = sorted(i for i in range(100) if i % 3 != 0)

    class Kill(Exception):
        pass

    # the swap sequence is 4 mutations; kill before each, then a
    # crash-free control run (budget 99)
    for budget in (0, 1, 2, 3, 99):
        path = fresh_ledger(f"b{budget}")
        left = [budget]

        def tick():
            if left[0] == 0:
                raise Kill()
            left[0] -= 1

        class CrashingPath:
            def __init__(self, *a):
                self._p = RealPath(*a)

            def exists(self):
                return self._p.exists()

            def rename(self, target):
                tick()
                return self._p.rename(target)

        real_rmtree = shutil.rmtree

        def crashing_rmtree(p, *a, **kw):
            tick()
            return real_rmtree(p, *a, **kw)

        monkeypatch.setattr(sinks, "Path", CrashingPath)
        monkeypatch.setattr(shutil, "rmtree", crashing_rmtree)
        try:
            folded = fold_tombstones(spark, path, "k")
            assert budget == 99 and folded is True
        except Kill:
            assert budget < 4
        finally:
            monkeypatch.setattr(sinks, "Path", RealPath)
            monkeypatch.setattr(shutil, "rmtree", real_rmtree)

        # (a) a readable ledger with the folded semantics survives
        assert surviving_keys(path) == expected
        # (b) re-running the fold converges to the crash-free state
        fold_tombstones(spark, path, "k")
        assert not RealPath(path + "__tombstones").exists()
        assert not RealPath(path + ".__swap_old").exists()
        assert surviving_keys(path) == expected
        assert sorted(
            r[0] for r in spark.read.parquet(path).select("k").collect()
        ) == expected


def test_substring_probe_drops_purged_windows(spark, sf_dir, tmp_path):
    """After the window purge, total dup_chars over the batch can only
    go down vs the non-deleted ledger (same batch, smaller ledger)."""
    from zcode_iceberg_spark.suite.llm import SUBSTR_L, build_substr_state

    base_state = str(tmp_path / "substr_base")
    ledger0, cut = build_substr_state(spark, sf_dir, base_state)
    before = (
        substring_dedup_against(spark, sf_dir, ledger0, cut)
        .agg(F.sum("dup_chars"))
        .collect()[0][0]
    )
    del_state = str(tmp_path / "substr_del")
    ledger1, cut1 = build_substr_state_deleted(spark, sf_dir, del_state)
    assert cut1 == cut
    after = (
        substring_dedup_against(spark, sf_dir, ledger1, cut)
        .agg(F.sum("dup_chars"))
        .collect()[0][0]
    )
    assert after <= before
    # the purged ledger is strictly smaller (takedown docs exist)
    n0 = spark.read.parquet(ledger0).count()
    n1 = spark.read.parquet(ledger1).count()
    assert n1 < n0
