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

Like ``read_jsonl``, the quarantining read is a text scan +
``from_csv`` rather than the CSV reader's ``_corrupt_record``
machinery: the analyzer rejects plans that prune to only the corrupt
column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the documented cache
workaround materializes the corpus. ``from_csv`` marks unparseable
lines in an ordinary struct field — prunable, no caching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def _header_line(schema: T.StructType, sep: str) -> str:
    return sep.join(f.name for f in schema.fields)


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
    offending record). With ``strict=True`` the read delegates to the
    FAILFAST reader and the quarantine frame is empty by construction.

    With ``header=True``, header rows are recognized by exact match
    against the schema's column names (one header per shard file, the
    layout ``write_csv`` produces) — position-in-file is meaningless
    after a text scan, and a name match is the only self-describing
    marker a CSV line carries.
    """
    if strict:
        df = (
            spark.read.schema(schema)
            .option("mode", "FAILFAST")
            .option("header", header)
            .option("sep", sep)
            .csv(path)
        )
        return df, spark.createDataFrame([], "raw_line string")
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    lines = spark.read.text(path).filter(F.trim("value") != "")
    if header:
        lines = lines.filter(F.col("value") != _header_line(schema, sep))
    parsed = lines.select(
        "value",
        F.from_csv(
            "value",
            read_schema.simpleString(),
            {"columnNameOfCorruptRecord": _CORRUPT, "sep": sep},
        ).alias("r"),
    )
    bad = F.col("r").isNull() | F.col("r")[_CORRUPT].isNotNull()
    valid = parsed.filter(~bad).select(
        *[F.col("r")[f.name].alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(bad).select(F.col("value").alias("raw_line"))
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
    Spark's RFC-4180 default so embedded delimiters/quotes round-trip."""
    out = df.repartition(n_shards) if n_shards else df
    writer = (
        out.write.mode("overwrite").option("header", header).option("sep", sep)
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
    """Streaming twin of ``read_csv``: file-source stream over arriving
    CSV shards, same explicit schema, corrupt rows carried as
    ``_corrupt_record`` for a routing sink to split (a stream returns
    one frame; routing is the sink's job)."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.readStream.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", header)
        .option("sep", sep)
        .option("maxFilesPerTrigger", 1)
        .csv(src_dir)
    )
