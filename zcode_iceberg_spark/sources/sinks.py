"""Sinks + table-maintenance operations (SURVEY A6-A10; BASELINE
north-star "Spark read/write + maintenance ops").

The reference sinks are three Excel sheets, Telegram messages, and
rotating logs (zscore_excel_logger.py, telegram_notifier.py). The
engine equivalents are parquet table writes with the layouts that
matter at 100 TB:

- append-mode event/ledger tables partitioned by day — partition
  pruning makes per-day reads O(day), and writers never rewrite
  history (A6/A7: per-trade ledger, per-decision feature log);
- per-partition upsert for the daily-summary table via DYNAMIC
  partition overwrite — only touched days are rewritten, the Delta/
  Iceberg MERGE analog on plain parquet (A8);
- compaction: rewrite a directory to target file sizes — the
  small-files problem is THE operational failure mode of streaming
  parquet sinks at scale;
- table stats: file/row/byte counts + per-column min/max from
  metadata + a single scan, for planner visibility and sanity checks.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_append(
    df: DataFrame, path: str, ts_col: str, partition_col: str = "day"
) -> None:
    """Append rows partitioned by calendar day of `ts_col` (ledger /
    feature-log sink, A6/A7)."""
    (
        df.withColumn(partition_col, F.date_format(ts_col, "yyyy-MM-dd"))
        .write.mode("append")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_daily_partitions(
    df: DataFrame, path: str, partition_col: str = "day"
) -> None:
    """Upsert per-day aggregate rows: dynamic partition overwrite
    rewrites ONLY the partitions present in `df` (A8 daily-summary
    upsert; plain-parquet analog of a MERGE on day)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns
    the output file count. Uses the source's on-disk byte size to pick
    the file count, then a single repartition (round-robin, no key
    skew) before the write."""
    total_bytes = sum(
        f.stat().st_size for f in Path(src).rglob("*.parquet") if f.is_file()
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files


def cluster_rewrite(
    spark: SparkSession, src: str, dst: str, cols: list[str], n_files: int
) -> str:
    """Sort-cluster a table's file layout on `cols` — the plain-parquet
    analog of an Iceberg/Delta sort-order rewrite: range-repartition on
    the keys (sampled range bounds → near-equal file sizes, no manual
    histogram), then sort within each file. Every output file then
    covers a narrow, essentially disjoint key range, so parquet footer
    min/max stats let ANY reader skip files a predicate cannot match.
    At 100 TB this layout is the difference between touching every
    file and touching the handful a key/time-range query overlaps —
    the same stats also tighten row-group pruning inside each file."""
    df = spark.read.parquet(src)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return dst


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Versioned snapshot write — the plain-parquet analog of a table
    format's snapshot log: each write lands whole in
    ``table_dir/v=N`` (N = prior max + 1) and never mutates earlier
    versions, so concurrent readers keep a consistent view and any
    version stays readable until expired (time travel). Returns N."""
    versions = _snapshot_versions(table_dir)
    n = (max(versions) + 1) if versions else 0
    df.write.mode("errorifexists").parquet(f"{table_dir}/v={n}")
    return n


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot version, or the latest when omitted."""
    versions = _snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    v = max(versions) if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"snapshot v={v} not in {sorted(versions)}")
    return spark.read.parquet(f"{table_dir}/v={v}")


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Garbage-collect old snapshots, keeping the newest `keep_last`;
    returns the expired version numbers."""
    import shutil as _shutil

    versions = sorted(_snapshot_versions(table_dir))
    expired = versions[:-keep_last] if keep_last > 0 else versions
    for v in expired:
        _shutil.rmtree(f"{table_dir}/v={v}")
    return expired


def _snapshot_versions(table_dir: str) -> list[int]:
    p = Path(table_dir)
    if not p.exists():
        return []
    return [
        int(d.name.split("=", 1)[1])
        for d in p.iterdir()
        if d.is_dir() and d.name.startswith("v=")
    ]


def log_schema_action(table_dir: str, op: str, **kw) -> None:
    """Append one schema-evolution action to the table's schema log
    (``_schema_log.json``) — the plain-parquet analog of a table
    format's field-id-based schema evolution. Supported ops:

    - ``rename``: ``from_name`` → ``to`` (old files keep the old
      column name on disk; reads normalize it);
    - ``widen``: ``col`` promoted to ``to`` (a wider Spark type, e.g.
      int → bigint, float → double — old files keep the narrow type);
    - ``add``: ``col`` of ``type`` (old files simply lack it; reads
      surface NULL, exactly like Iceberg/Delta add-column).

    The log is ordered: actions apply oldest-first at read time, so a
    column can be renamed and later widened. Nothing on disk is
    rewritten — that is the point: at 100 TB a schema change must be
    O(metadata), not O(table)."""
    import json as _json

    allowed = {"rename": {"from_name", "to"}, "widen": {"col", "to"},
               "add": {"col", "type"}}
    if op not in allowed or set(kw) != allowed[op]:
        raise ValueError(f"schema action {op!r} needs exactly {allowed.get(op)}")
    p = Path(table_dir) / "_schema_log.json"
    log = _json.loads(p.read_text()) if p.exists() else []
    log.append({"op": op, **kw})
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(_json.dumps(log, indent=1))


def evolved_read(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read EVERY snapshot version under ``table_dir`` as one frame in
    the CURRENT schema, applying the schema log to old vintages:
    renamed columns are mapped to their new name, widened columns cast
    up, added columns surface as NULL in files that predate them.

    Scale shape: each version directory is one parquet scan with its
    own (uniform) physical schema — no ``mergeSchema`` footer
    reconciliation pass, which both fails on type widening and costs a
    footer read per file; the union is a zero-shuffle UnionExec and
    every filter/pruning still pushes into each scan independently."""
    import json as _json

    versions = sorted(_snapshot_versions(table_dir))
    if not versions:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    p = Path(table_dir) / "_schema_log.json"
    log = _json.loads(p.read_text()) if p.exists() else []

    def normalize(df: DataFrame) -> DataFrame:
        for act in log:
            if act["op"] == "rename" and act["from_name"] in df.columns:
                df = df.withColumnRenamed(act["from_name"], act["to"])
            elif act["op"] == "widen" and act["col"] in df.columns:
                df = df.withColumn(act["col"], F.col(act["col"]).cast(act["to"]))
            elif act["op"] == "add" and act["col"] not in df.columns:
                df = df.withColumn(act["col"], F.lit(None).cast(act["type"]))
        return df

    out = None
    for v in versions:
        part = normalize(spark.read.parquet(f"{table_dir}/v={v}"))
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return out


def _recover_swap(path: str) -> None:
    """Restore a table whose :func:`_swap_in` crashed between moving
    the old data aside and moving the new data in: the aside copy is
    the only readable version, so rename it back. No-op when the
    table exists (including when a stale aside copy survives a crash
    AFTER the new data went live — `_swap_in` clears it)."""
    old = path.rstrip("/") + ".__swap_old"
    if not Path(path).exists() and Path(old).exists():
        Path(old).rename(path.rstrip("/"))


def _swap_in(tmp: str, path: str) -> None:
    """Crash-safe swap of a staged directory into the live path:
    rename the live data ASIDE, move the staged data in, then drop
    the old copy. A crash between any two steps leaves a readable
    table — old data at `path`, old data at the aside path (restored
    by :func:`_recover_swap` on the next maintenance call), or new
    data at `path`. The previous rmtree-then-rename ordering had a
    window (after the rmtree, before the rename) with NO table."""
    import shutil as _shutil

    p = path.rstrip("/")
    old = p + ".__swap_old"
    if Path(old).exists():
        _shutil.rmtree(old)  # leftover from a crash after the new data went live
    Path(p).rename(old)
    Path(tmp).rename(p)
    _shutil.rmtree(old)


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> None:
    """Row-level MERGE (upsert by key) on a plain-parquet table:
    survivors = target LEFT ANTI updates on the key, result =
    survivors ∪ updates — matched rows are replaced, unmatched rows
    inserted. Plain parquet has no row-level delete metadata, so a
    merge IS a rewrite; the scale discipline is to bound what gets
    rewritten — partition the table and merge only touched partitions
    (see :func:`upsert_daily_partitions` for the partition-level
    form), or graduate to a table format with delete files when
    rewrite amplification dominates. The result is staged to a temp
    directory and swapped in crash-safely (:func:`_swap_in`), because
    lazily reading and overwriting the same path would corrupt the
    table mid-scan."""
    _recover_swap(path)
    tgt = spark.read.parquet(path)
    merged = tgt.join(updates.select(key), key, "left_anti").unionByName(updates)
    tmp = path.rstrip("/") + ".__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, path)


def merge_bitwise_or(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "byte_idx",
    mask: str = "byte_mask",
) -> None:
    """MERGE for bitmask tables (Bloom bitsets, presence maps): result
    = per-key ``bit_or`` of target ∪ updates. Unlike row replacement
    (:func:`merge_upsert`), OR-merge is a join-semilattice — idempotent
    (re-merging the same update is a no-op) and commutative — so an
    at-least-once stream can replay an epoch with NO epoch bookkeeping
    and the table is unchanged by algebra, not by bookkeeping
    discipline. Staged to a temp directory and swapped in, same as
    merge_upsert, because lazily reading and overwriting one path
    would corrupt the table mid-scan."""
    _recover_swap(path)
    tgt = spark.read.parquet(path)
    merged = (
        tgt.unionByName(updates)
        .groupBy(key)
        .agg(F.bit_or(mask).alias(mask))
    )
    tmp = path.rstrip("/") + ".__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, path)


def ledger_delete(
    spark: SparkSession, path: str, tombstones: DataFrame, key: str
) -> str:
    """Row-level DELETE on a plain-parquet ledger, staged as an
    equality-delete TOMBSTONE sidecar (the Iceberg-v2 merge-on-read
    pattern): the delete itself appends only the keys — metadata-sized,
    no ledger rewrite — and takes effect at read time
    (:func:`read_with_tombstones`) until a compaction folds it in
    (:func:`fold_tombstones`). This is the takedown / PII-removal seam
    for the persisted-ingest-state family: at 100 TB a removal request
    must not rewrite a corpus-sized hash ledger synchronously.

    Replay-idempotent by SET semantics: re-deleting the same keys
    merge-upserts the identical rows, so an at-least-once takedown
    queue can replay a delete epoch and the sidecar is unchanged."""
    tomb = path.rstrip("/") + "__tombstones"
    keys = tombstones.select(key).distinct()
    if Path(tomb).exists():
        merge_upsert(spark, tomb, keys, key)
    else:
        keys.write.parquet(tomb)
    return tomb


def read_with_tombstones(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Merge-on-read over a tombstoned ledger: survivors = ledger LEFT
    ANTI its delete sidecar on the key. The anti join hash-partitions
    on the ledger key — the same partitioning every probe join already
    uses, so the delete filter rides the shuffle the probe pays anyway.
    No sidecar → plain read (zero overhead once compaction folded)."""
    _recover_swap(path)  # a fold crash must not strand readers
    df = spark.read.parquet(path)
    tomb = path.rstrip("/") + "__tombstones"
    if Path(tomb).exists():
        df = df.join(spark.read.parquet(tomb).select(key), key, "left_anti")
    return df


def fold_tombstones(spark: SparkSession, path: str, key: str) -> bool:
    """Compaction step that folds pending tombstones into the ledger:
    survivors are rewritten in place (staged to a temp dir and swapped
    crash-safely via :func:`_swap_in`) and the sidecar is dropped LAST,
    so subsequent reads pay no anti join. Returns whether a fold
    happened (no sidecar → no-op, making nightly maintenance
    idempotent). Crash-safety: a kill between any two steps leaves a
    readable ledger (old at `path`, old at the aside path — restored
    on the next call — or new at `path`), and because the sidecar
    outlives the swap, re-running the fold after a crash re-applies
    the same anti join idempotently. The deleted keys are NOT retained
    anywhere after the fold — a takedown must not leave the purged
    content's fingerprints in a retained delete log."""
    import shutil as _shutil

    _recover_swap(path)
    tomb = path.rstrip("/") + "__tombstones"
    if not Path(tomb).exists():
        return False
    survivors = read_with_tombstones(spark, path, key)
    tmp = path.rstrip("/") + ".__fold_tmp"
    survivors.write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, path)
    _shutil.rmtree(tomb)
    return True


def zorder_key(bucket_cols: list, bits: int = 8):
    """Morton (Z-order) key: interleave the bits of per-column integer
    buckets so that sorting by the single key keeps rows close in
    EVERY clustered dimension at once — the multi-column file-skipping
    layout (Delta OPTIMIZE ZORDER analog). `bucket_cols` are integer
    Columns already scaled to [0, 2^bits)."""
    n = len(bucket_cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def zorder_rewrite(
    spark: SparkSession,
    src: str,
    dst: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> str:
    """Z-order cluster rewrite on multiple columns: bucket each column
    to 2^bits levels on its [min, max] span (one tiny agg; at scale
    use sampled quantile bounds for skew), interleave into a Morton
    key, then range-partition + sort on the key. Unlike the linear
    `cluster_rewrite` — where only the FIRST sort column gets tight
    per-file ranges — every clustered column's per-file min/max span
    shrinks to roughly range/n_files^(1/k), so predicates on ANY of
    the k columns skip files."""
    df = spark.read.parquet(src)
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo, hi = float(bounds[f"lo_{c}"]), float(bounds[f"hi_{c}"])
        span = (hi - lo) or 1.0
        buckets.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c) - F.lit(lo)) / F.lit(span) * F.lit(top + 1)).cast(
                    "long"
                ),
            )
        )
    keyed = df.withColumn("_zkey", zorder_key(buckets, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(dst)
    )
    return dst


def table_stats(spark: SparkSession, path: str) -> dict:
    """Maintenance visibility: file/byte counts from the filesystem,
    row count + per-numeric-column min/max from one scan."""
    files = [f for f in Path(path).rglob("*.parquet") if f.is_file()]
    df = spark.read.parquet(path)
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float", "long", "integer")
    ]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in numeric:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    return {
        "n_files": len(files),
        "total_bytes": sum(f.stat().st_size for f in files),
        "n_rows": row.pop("__rows"),
        "column_ranges": row,
    }


def drawdown_state_step(
    spark: SparkSession, state_path: str, batch: DataFrame
) -> None:
    """One foreachBatch step of the LIVE risk table: fold a batch of
    newly closed trades into the per-user (equity, peak, drawdown)
    state — the streaming deployment of ``q_ledger_drawdown``
    (suite/stateful.py), maintained incrementally instead of recomputed
    (reference analog: risk_manager.py's running daily_pnl counters,
    upgraded to a full equity-curve table).

    Exactness: equity and peak are carried as integer micro-units, so
    any batch slicing of the trade stream folds to the same state;
    within a batch the running curve is a cumulative window in
    trade_seq order (close order per user). The upsert rewrites only
    the touched users' rows via the staged-swap MERGE."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    from zcode_iceberg_spark.operators.stateful import micro

    if batch.isEmpty():
        return
    first = False
    try:
        cur = spark.read.parquet(state_path).select(
            "user_id", "eq_u", "peak_u", "n_trades", "last_seq"
        )
    except AnalysisException:  # first batch: empty state table
        first = True
        cur = spark.createDataFrame(
            [],
            "user_id bigint, eq_u bigint, peak_u bigint, "
            "n_trades bigint, last_seq int",
        )
    w = (
        Window.partitionBy("user_id")
        .orderBy("trade_seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = (
        batch.select("user_id", "trade_seq", micro("pnl").alias("pnl_u"))
        .join(F.broadcast(cur.select("user_id", "eq_u", "peak_u")), "user_id", "left")
        .withColumn(
            "run_u", F.coalesce("eq_u", F.lit(0)) + F.sum("pnl_u").over(w)
        )
    )
    upd = run.groupBy("user_id").agg(
        F.max_by("run_u", "trade_seq").alias("new_eq_u"),
        # greatest() skips NULLs: a user absent from the state simply
        # gets the batch max — no phantom 0 peak (equity curves that
        # never go positive must keep their negative running peak)
        F.greatest(F.first("peak_u"), F.max("run_u")).alias("new_peak_u"),
        F.count(F.lit(1)).alias("batch_n"),
        F.max("trade_seq").alias("new_last_seq"),
    )
    merged = (
        upd.join(F.broadcast(cur.select("user_id", "n_trades")), "user_id", "left")
        .select(
            "user_id",
            F.col("new_eq_u").alias("eq_u"),
            F.col("new_peak_u").alias("peak_u"),
            (F.coalesce("n_trades", F.lit(0)) + F.col("batch_n")).alias(
                "n_trades"
            ),
            F.col("new_last_seq").alias("last_seq"),
        )
    )
    if first:
        merged.write.mode("overwrite").parquet(state_path)
    else:
        merge_upsert(spark, state_path, merged, "user_id")


def route_quarantine(
    stream_df: DataFrame,
    valid_dir: str,
    quarantine_dir: str,
    checkpoint: str,
    corrupt_col: str = "_corrupt_record",
):
    """Split a PERMISSIVE-parsed stream (``csvio.stream_csv`` /
    ``jsonl.stream_jsonl``) into TWO tables per micro-batch: clean rows
    (corrupt marker dropped) appended to ``valid_dir``, malformed raw
    lines appended to ``quarantine_dir`` — the routing sink the
    quarantine contract defers to ("a stream returns one frame;
    routing is the sink's job"). Drains with availableNow and blocks,
    mirroring ``run_available_now``.

    Scale shape: the batch frame is persisted once so the two writes
    don't re-parse the source files. Each batch lands in a
    ``batch_id=<epoch>`` hive-style subdirectory written with
    mode("overwrite") — foreachBatch is at-least-once, so a restart
    that replays a batch (failure between the two writes, or mid-
    write) OVERWRITES the partition it already committed instead of
    appending duplicates; epoch ids are stable across restarts from
    the same checkpoint, which is what makes the replay land on the
    same directory. Readers of either table see ``batch_id`` as an
    ordinary partition column (per-batch lineage/compaction for free;
    ``drop("batch_id")`` to ignore it)."""
    _route_two_way(
        stream_df,
        checkpoint,
        [
            (
                valid_dir,
                lambda b: b.filter(F.col(corrupt_col).isNull()).drop(corrupt_col),
            ),
            (
                quarantine_dir,
                lambda b: b.filter(F.col(corrupt_col).isNotNull()).select(
                    F.col(corrupt_col).alias("raw_line")
                ),
            ),
        ],
    )


def route_by_flag(
    stream_df: DataFrame,
    keep_dir: str,
    drop_dir: str,
    checkpoint: str,
    flag_col: str = "keep",
):
    """Boolean-routing twin of :func:`route_quarantine` for SCORED
    streams (e.g. streaming/pipeline.py:quality_filter_stream): rows
    whose ``flag_col`` is true land in ``keep_dir``, EVERYTHING else
    — false or NULL — in ``drop_dir`` (null-safe split, so the two
    routes are provably exhaustive: a scorer bug that yields a NULL
    flag produces an auditable drop row, never a vanished document).
    FULL rows on both sides (quality drops are corpus to re-score
    under a new model, not corrupt text, so nothing is reduced to a
    raw line). Same scale shape and at-least-once-safe
    ``batch_id=<epoch>`` overwrite layout as route_quarantine (shared
    scaffolding: ``_route_two_way``)."""
    is_kept = F.col(flag_col).eqNullSafe(F.lit(True))
    _route_two_way(
        stream_df,
        checkpoint,
        [
            (keep_dir, lambda b: b.filter(is_kept)),
            (drop_dir, lambda b: b.filter(~is_kept)),
        ],
    )


def _route_two_way(stream_df: DataFrame, checkpoint: str, routes) -> None:
    """Shared scaffolding for the two-table routing sinks
    (:func:`route_quarantine`, :func:`route_by_flag`): per micro-batch,
    persist once (the writes must not recompute the upstream parse /
    scoring projection), write each route's slice to its own
    ``batch_id=<epoch>`` subdirectory with mode("overwrite") —
    foreachBatch is at-least-once, so a replayed epoch rewrites the
    partition it already committed instead of appending duplicates
    (epoch ids are stable across restarts from one checkpoint).
    Drains with availableNow and blocks. ``routes`` is a list of
    (out_dir, slice_fn) pairs; the slicing predicates are the callers'
    contract and should be exhaustive."""
    from pyspark import StorageLevel

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for out_dir, slice_fn in routes:
                (
                    slice_fn(batch_df)
                    .write.mode("overwrite")
                    .parquet(f"{out_dir}/batch_id={batch_id}")
                )
        finally:
            batch_df.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # replayed batches overwrite files in place; drop any cached
    # listing so same-session readers don't chase deleted part files
    for out_dir, _ in routes:
        stream_df.sparkSession.catalog.refreshByPath(out_dir)


def drawdown_sink(ledger_stream: DataFrame, state_path: str, checkpoint: str):
    """Attach the live risk table to a streaming FSM ledger
    (streaming/pipeline.py:position_fsm_stream): every micro-batch of
    closed trades folds into the per-user equity/peak state. Returns
    the started StreamingQuery."""
    def step(batch_df: DataFrame, _batch_id: int) -> None:
        drawdown_state_step(batch_df.sparkSession, state_path, batch_df)

    return (
        ledger_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
