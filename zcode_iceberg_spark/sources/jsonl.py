"""JSONL (newline-delimited JSON) ingest/egress — the interchange
format LLM corpora actually ship in (one document object per line,
gzip-sharded). Reference analog: the feed layer's defensive JSON
normalization (data_manager.py:272-285 parses every inbound payload
defensively); here the same stance is applied to corpus files.

Scale stance:
- **Reads take an explicit schema, never inference.** Schema inference
  is a full extra pass over the data — a non-starter at 100 TB — and
  silently widens/narrows types between shards. The schema IS the
  contract; Spark's JSON reader prunes to it (only the listed fields
  are parsed, the rest of each line is skipped).
- **Corrupt lines are quarantined, not fatal and not silently
  dropped.** `read_jsonl` returns unparseable lines as a separate
  frame so a pipeline can count/inspect them (a 100 TB crawl WILL
  contain truncated shards); the streaming twin carries them as
  ``_corrupt_record`` rows for a routing sink. ``strict=True``
  switches to FAILFAST for pipelines that prefer loud death.
- **Writes shard by partition count** (one file per task, standard
  Spark contract) with optional gzip — line-splittable formats plus
  per-file compression is the layout downstream tokenizer jobs expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table contract, as a JSONL schema; the quarantine
# column is appended by read_jsonl itself
DOC_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_JSONL_SCHEMA,
    strict: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL directory/file → (valid_rows, corrupt_lines).

    ``valid_rows`` carries exactly ``schema``'s columns;
    ``corrupt_lines`` carries the raw offending line (one string
    column). With ``strict=True`` the read is FAILFAST and
    ``corrupt_lines`` is empty by construction.

    Both frames derive from a text scan + ``from_json`` rather than
    the reader's ``_corrupt_record`` machinery: Spark's analyzer
    rejects any query that prunes down to only the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — even ``valid.count()`` does,
    since the quarantine filter is then the only column reference),
    and the documented cache workaround would materialize a full copy
    of the corpus on the hot path. ``from_json`` with its own
    corrupt-record option marks unparseable lines in a plain struct
    field — same quarantine set, ordinary prunable expressions, no
    caching anywhere.
    """
    if strict:
        df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        return df, spark.createDataFrame([], "raw_line string")
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(
            "value",
            F.from_json(
                "value", read_schema, {"columnNameOfCorruptRecord": _CORRUPT}
            ).alias("r"),
        )
    )
    bad = F.col("r").isNull() | F.col("r")[_CORRUPT].isNotNull()
    valid = parsed.filter(~bad).select(
        *[F.col("r")[f.name].alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return valid, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compress: bool = False,
) -> None:
    """Write a frame as JSONL shards (one object per line, one file
    per task; ``n_shards`` repartitions first, round-robin for even
    shard sizes). ``compress=True`` gzips each shard — JSONL stays
    line-splittable per file, which is what sharded tokenizer /
    dataloader jobs consume."""
    out = df.repartition(n_shards) if n_shards else df
    writer = out.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)


def stream_jsonl(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType = DOC_JSONL_SCHEMA,
) -> DataFrame:
    """Streaming twin of ``read_jsonl`` (the engine's warmup/stream
    duality applied to the corpus source): a file-source stream over
    arriving JSONL shards with the SAME explicit schema and the same
    quarantine column — valid rows flow on, corrupt lines survive as
    ``_corrupt_record`` rows for a routing sink to split (a stream
    can't return two frames; routing is the sink's job). Composes
    directly with the document streams (dedup_stream,
    passage_dedup_stream) by selecting the valid columns."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.readStream.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
