"""CSV ingest/egress with the same defensive stance as the JSONL
module (sources/jsonl.py): explicit schema, quarantined corrupt rows,
sharded writes. Reference analog: the feed layer's defensive payload
normalization (data_manager.py:272-285) — applied here to the other
interchange format tabular corpora ship in.

Scale stance (shared with JSONL):
- **Explicit schema, never inference** — inference is an extra full
  pass at 100 TB and drifts types between shards.
- **Corrupt rows quarantined, not fatal, not silently dropped** —
  malformed lines (wrong arity, unparseable types) come back as a
  separate raw-line frame; ``strict=True`` flips to FAILFAST.
- **Writes shard by partition count**, optional gzip per shard.
- **Records are lines.** Quoted fields may contain the delimiter, but
  not newlines — multiline records break file splitting at scale, so
  they are out of contract here (same stance as ``multiLine=false``).
- **Header recognition is by exact string match**, one header per
  shard (the layout ``write_csv`` produces). A data row that
  serializes byte-identically to the header line (possible only with
  an all-string schema whose values equal the column names) is
  indistinguishable from a header after a text scan and is dropped —
  out of contract here, same as embedded newlines.

EVERY read path (permissive batch, strict batch, streaming) is a text
scan + ``from_csv`` — never Spark's native CSV reader. Two reasons:
(1) the native reader's ``header=true`` consumes the FIRST line of
every file unconditionally, so a one-line malformed shard is silently
swallowed as a "header" — exactly the silent drop this module's
contract forbids; (2) the ``_corrupt_record`` machinery rejects plans
that prune to only the corrupt column
(QUERY_ONLY_CORRUPT_RECORD_COLUMN) and the documented cache
workaround materializes the corpus. ``from_csv`` marks unparseable
lines in an ordinary struct field — prunable, no caching — and the
header filter is an explicit, visible predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def _header_line(schema: T.StructType, sep: str) -> str:
    return sep.join(f.name for f in schema.fields)


def _data_lines(lines: DataFrame, schema: T.StructType, sep: str, header: bool) -> DataFrame:
    """Strip blank lines and (if ``header``) per-shard header lines
    from a one-column ``value`` text frame. Shared by every read path
    so batch/strict/stream see the identical line population."""
    out = lines.filter(F.trim("value") != "")
    if header:
        out = out.filter(F.col("value") != _header_line(schema, sep))
    return out


def _parse_permissive(lines: DataFrame, schema: T.StructType, sep: str) -> DataFrame:
    """``value`` text frame → columns of ``schema`` + ``_corrupt_record``
    (NULL for clean rows, the raw line for malformed ones)."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = lines.select(
        "value",
        F.from_csv(
            "value",
            read_schema.simpleString(),
            {"columnNameOfCorruptRecord": _CORRUPT, "sep": sep},
        ).alias("r"),
    )
    bad = F.col("r").isNull() | F.col("r")[_CORRUPT].isNotNull()
    return parsed.select(
        *[F.col("r")[f.name].alias(f.name) for f in schema.fields],
        F.when(bad, F.col("value")).alias(_CORRUPT),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
    strict: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV directory/file → (valid_rows, corrupt_rows).

    ``valid_rows`` carries exactly ``schema``'s columns;
    ``corrupt_rows`` is one raw-line string column (the unparsed
    offending record). With ``strict=True`` the parse runs in FAILFAST
    mode over the same text-scan line population — any malformed line
    raises at execution time (never silently eaten as a header) and
    the quarantine frame is empty by construction. The module-level
    out-of-contract carve-outs apply to strict mode too: blank/
    whitespace-only lines and (with ``header=True``) data rows
    byte-identical to the header line are removed by the shared
    ``_data_lines`` filter BEFORE the FAILFAST guard sees them, so
    they are dropped rather than raised on. Pass ``header=False``
    when the input has no headers to keep header-identical rows.

    With ``header=True``, header rows are recognized by exact match
    against the schema's column names (one header per shard file, the
    layout ``write_csv`` produces) — position-in-file is meaningless
    after a text scan, and a name match is the only self-describing
    marker a CSV line carries.
    """
    lines = _data_lines(spark.read.text(path), schema, sep, header)
    flat = _parse_permissive(lines, schema, sep)
    if strict:
        # A Filter node survives column pruning (a bare FAILFAST parse
        # would be pruned away by e.g. count()), so the guard is a
        # filter whose predicate raises on the first malformed line.
        guard = F.when(
            F.col(_CORRUPT).isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit("FAILFAST: malformed CSV line: "), F.col(_CORRUPT)
                )
            ),
        ).otherwise(F.lit(True))
        df = flat.filter(guard).drop(_CORRUPT)
        return df, spark.createDataFrame([], "raw_line string")
    valid = flat.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    corrupt = flat.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return valid, corrupt


def write_csv(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    header: bool = True,
    sep: str = ",",
    compress: bool = False,
) -> None:
    """Write a frame as CSV shards (one file per task; ``n_shards``
    repartitions round-robin first for even shard sizes); quoting is
    Spark's RFC-4180 default so embedded delimiters/quotes round-trip.
    Leading/trailing whitespace is PRESERVED (Spark's writer trims it
    by default, which silently mutates ' '-padded fields — a
    round-trip violation the property test pins)."""
    out = df.repartition(n_shards) if n_shards else df
    writer = (
        out.write.mode("overwrite")
        .option("header", header)
        .option("sep", sep)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.csv(path)


def stream_csv(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Streaming twin of ``read_csv``: file-source TEXT stream over
    arriving CSV shards, normalized with the exact batch-path
    ``from_csv`` parse, corrupt rows carried as ``_corrupt_record``
    for a routing sink to split (a stream returns one frame; routing
    is the sink's job — see ``sinks.route_quarantine``). Text-scan,
    not the native CSV stream, so a one-line malformed shard is
    quarantined instead of being consumed as that file's "header"."""
    lines = (
        spark.readStream.option("maxFilesPerTrigger", 1).text(src_dir)
    )
    return _parse_permissive(_data_lines(lines, schema, sep, header), schema, sep)
