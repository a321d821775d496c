"""ORC ingest/egress — the third interchange format next to parquet
and the line formats (jsonl.py, csvio.py). Reference analog: the feed
layer's normalized payload persistence (data_manager.py:272-285),
here for corpora that ship as ORC (Hive-lineage warehouses).

ORC is a columnar binary format with a JVM-native vectorized reader
in Spark, so — unlike the line formats — there is no per-LINE
corruption granularity to quarantine: a damaged stripe/file fails the
scan as a unit. The defensive stance therefore shifts entirely to
schema discipline:

- **Explicit schema on every read** — never footer-merge inference
  (`mergeSchema` is an extra footer pass per file at 100 TB, and
  silently widens drifted shards); a shard whose physical schema
  can't satisfy the declared one fails loudly at scan time.
- **Predicate pushdown + column pruning parity with parquet** — the
  ORC reader pushes search arguments (SArgs) into stripe/row-group
  skipping; `tests/test_orcio.py` plan-asserts the pushdown so the
  parity claim is proven, not assumed.
- **Writes shard by partition count** (round-robin repartition for
  even shard sizes), optional zlib per-stripe compression.
- **Streaming twin** mirrors the batch read exactly (same explicit
  schema), composing with `run_available_now` / the routing sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read an ORC directory/file with a declared schema (no
    inference pass; mismatched shards fail at scan, not silently
    coerce)."""
    return spark.read.schema(schema).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compress: bool = True,
) -> None:
    """Write a frame as ORC shards (one file per task; ``n_shards``
    repartitions round-robin first for even shard sizes).
    ``compress=True`` uses zlib (ORC's universally-readable codec);
    False writes uncompressed stripes."""
    out = df.repartition(n_shards) if n_shards else df
    (
        out.write.mode("overwrite")
        .option("compression", "zlib" if compress else "none")
        .orc(path)
    )


def stream_orc(
    spark: SparkSession, src_dir: str, schema: T.StructType
) -> DataFrame:
    """Streaming twin of ``read_orc``: file-source stream over
    arriving ORC shards, same explicit schema."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .orc(src_dir)
    )
