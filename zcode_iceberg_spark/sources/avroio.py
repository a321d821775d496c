"""Avro ingest/egress — the fourth interchange format next to parquet,
ORC, and the line formats. Reference analog: the feed layer's
normalized payload persistence (data_manager.py:272-285), here for
corpora that ship as Avro (Kafka-lineage pipelines, schema-registry
shops).

This container ships neither the ``spark-avro`` data source jar nor a
Python avro package, so the module implements the Avro 1.11 **Object
Container File** spec (public: magic ``Obj\\x01``, metadata map with
``avro.schema``/``avro.codec``, sync-marker-delimited deflate/null
blocks, zigzag-varint primitives) as a pure-Python codec run INSIDE
Spark:

- **read**: ``binaryFile`` scan → ``mapInArrow`` decode, one task
  per container file — decode parallelism == file count, payloads
  never touch the driver;
- **write**: ``mapInArrow`` over the outgoing partitions, one
  container file per task written to shared storage, manifest rows
  back to the driver.

Arrow END TO END, never pandas: the pandas hop coerces
int64-with-null columns to float64 (silently rounding longs past
2^53) and nullifies genuine NaN doubles — both lossless-contract
violations the tests pin.

Defensive stance (shared with orcio): **explicit schema, never
inference** — every file's embedded writer schema is checked against
the declared reader schema and a drifted shard fails loudly at scan
time, never silently coerces. Corruption granularity is the block
(sync-marker check), reported with the file path.

Honest scale note: Avro is a ROW-major format — no column pruning or
predicate pushdown can reach inside a block, so the engine treats it
as an ingest/egress format (decode once, land parquet, query that),
not a query-scan format. Supported field types: long, int, double,
float, boolean, string, binary, timestamp (micros logical type);
every field encodes as the nullable union ``["null", T]`` (Spark
columns are nullable by default).
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic marker (any 16 bytes is legal)

_SPARK_TO_AVRO = {
    T.LongType(): "long",
    T.IntegerType(): "int",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.BooleanType(): "boolean",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}
_TS_AVRO = {"type": "long", "logicalType": "timestamp-micros"}


def avro_schema(schema: T.StructType, name: str = "row") -> dict:
    """Spark schema → Avro record schema (nullable-union fields)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            at = _TS_AVRO
        elif f.dataType in _SPARK_TO_AVRO:
            at = _SPARK_TO_AVRO[f.dataType]
        else:
            raise TypeError(
                f"unsupported Avro field type: {f.name}: {f.dataType}"
            )
        fields.append({"name": f.name, "type": ["null", at]})
    return {"type": "record", "name": name, "fields": fields}


def _field_kind(avro_type) -> str:
    """Normalize one field's writer type → primitive kind string.
    Accepts bare types, {"type": ...} dicts, and ["null", T] unions."""
    t = avro_type
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported Avro union: {t}")
        t = non_null[0]
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return "timestamp"
        t = t["type"]
    if t not in ("long", "int", "double", "float", "boolean", "string", "bytes"):
        raise ValueError(f"unsupported Avro type: {t}")
    return t


def _schema_kinds(avro_rec: dict) -> list[tuple[str, str, bool]]:
    """[(name, kind, nullable)] in writer order."""
    out = []
    for f in avro_rec["fields"]:
        nullable = isinstance(f["type"], list) and "null" in f["type"]
        out.append((f["name"], _field_kind(f["type"]), nullable))
    return out


# ------------------------------------------------------------ binary encode

def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_value(kind: str, v, out: bytearray) -> None:
    if kind in ("long", "int", "timestamp"):
        out += _zigzag(int(v))
    elif kind == "double":
        out += struct.pack("<d", float(v))
    elif kind == "float":
        out += struct.pack("<f", float(v))
    elif kind == "boolean":
        out.append(1 if v else 0)
    elif kind == "string":
        b = str(v).encode("utf-8")
        out += _zigzag(len(b)) + b
    elif kind == "bytes":
        b = bytes(v)
        out += _zigzag(len(b)) + b
    else:  # pragma: no cover — guarded by _field_kind
        raise ValueError(kind)


def _encode_block(rows: list[tuple], kinds, codec: str) -> bytes:
    body = bytearray()
    for row in rows:
        for (name, kind, nullable), v in zip(kinds, row):
            if nullable:
                if v is None:
                    body += _zigzag(0)
                    continue
                body += _zigzag(1)
            elif v is None:
                raise ValueError(f"null in non-nullable field {name}")
            _enc_value(kind, v, body)
    data = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = co.compress(data) + co.flush()
    return _zigzag(len(rows)) + _zigzag(len(data)) + data + SYNC


def _container_header(avro_rec: dict, codec: str) -> bytes:
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_rec).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)  # end of metadata map
    out += SYNC
    return bytes(out)


# ------------------------------------------------------------ binary decode

class _Cursor:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def long(self) -> int:
        acc = 0
        shift = 0
        b = self.b
        i = self.i
        while True:
            byte = b[i]
            i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.i = i
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, n: int) -> bytes:
        v = self.b[self.i : self.i + n]
        self.i += n
        return bytes(v)

    def eof(self) -> bool:
        return self.i >= len(self.b)


def _dec_value(kind: str, c: _Cursor):
    if kind in ("long", "int", "timestamp"):
        return c.long()
    if kind == "double":
        return struct.unpack("<d", c.raw(8))[0]
    if kind == "float":
        return struct.unpack("<f", c.raw(4))[0]
    if kind == "boolean":
        return c.raw(1) == b"\x01"
    if kind == "string":
        return c.raw(c.long()).decode("utf-8")
    if kind == "bytes":
        return c.raw(c.long())
    raise ValueError(kind)  # pragma: no cover


def decode_container(content: bytes, path: str = "<buf>"):
    """One container file → (writer avro schema dict, rows iterator)."""
    c = _Cursor(content)
    if c.raw(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = c.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count → block byte size follows
            n = -n
            c.long()
        for _ in range(n):
            k = c.raw(c.long()).decode()
            meta[k] = c.raw(c.long())
    sync = c.raw(16)
    rec = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported codec {codec}")
    kinds = _schema_kinds(rec)

    def rows() -> Iterator[tuple]:
        while not c.eof():
            count = c.long()
            size = c.long()
            data = c.raw(size)
            if c.raw(16) != sync:
                raise ValueError(f"{path}: sync-marker mismatch (corrupt block)")
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            bc = _Cursor(data)
            for _ in range(count):
                row = []
                for _name, kind, nullable in kinds:
                    if nullable and bc.long() == 0:
                        row.append(None)
                        continue
                    row.append(_dec_value(kind, bc))
                yield tuple(row)

    return rec, rows


# --------------------------------------------------------------- Spark API

def _check_schema(rec: dict, declared: T.StructType, path: str) -> None:
    got = [(n, k) for n, k, _ in _schema_kinds(rec)]
    want = [
        (f.name, _field_kind(avro_schema(T.StructType([f]))["fields"][0]["type"]))
        for f in declared.fields
    ]
    if got != want:
        raise ValueError(
            f"{path}: writer schema {got} does not match declared {want}"
        )


def _pdf_cell(v, kind: str):
    # Arrow's to_pylist keeps None and NaN distinct — only None maps
    # to the Avro null branch; a genuine NaN double must round-trip
    # as NaN (lossless contract), never silently become null
    if v is None:
        return None
    if kind == "timestamp":
        return int(pd.Timestamp(v).value // 1000)  # ns → micros
    if kind in ("long", "int"):
        return int(v)
    if kind in ("double", "float"):
        return float(v)
    if kind == "boolean":
        return bool(v)
    if kind == "bytes":
        return bytes(v)
    return str(v)


def write_avro(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    codec: str = "deflate",
    rows_per_block: int = 4096,
) -> int:
    """Write a frame as Avro container shards — one file per task,
    encoded executor-side (``mapInArrow``; the driver only collects
    the manifest). ``n_shards`` repartitions round-robin first for
    even shard sizes; ``codec`` is ``deflate`` (raw-DEFLATE blocks,
    the spec's universally-readable codec) or ``null``. Returns the
    shard count. Executors write to ``path`` directly, so it must be
    storage every task can reach (true for any real deployment's
    shared FS, and for local mode).

    The encode side reads Arrow record batches directly (NOT pandas):
    pandas coerces an int64 column containing a null to float64, which
    silently rounds longs above 2^53 — Arrow's ``to_pylist`` keeps
    exact ints + None, preserving the lossless contract
    (round-trip-pinned for >2^53 ids in tests/test_avroio.py)."""
    import os
    import shutil

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec}")
    rec = avro_schema(df.schema)
    kinds = _schema_kinds(rec)
    names = [f.name for f in df.schema.fields]
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    header = _container_header(rec, codec)

    def emit(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        # stage-and-rename commit: a retried/zombie task never leaves a
        # half-written container at the published name, and the rename
        # is atomic on any POSIX filesystem (attempt id in the staging
        # name keeps concurrent attempts from clobbering each other)
        attempt = TaskContext.get().taskAttemptId()
        tmp_name = os.path.join(path, f".part-{pid:05d}.{attempt}.avro.tmp")
        n_rows = 0
        with open(tmp_name, "wb") as f:
            f.write(header)
            for batch in batches:
                by_name = {
                    n: batch.column(i).to_pylist()
                    for i, n in enumerate(batch.schema.names)
                }
                cols = [by_name[c] for c in names]
                rows = [
                    tuple(
                        _pdf_cell(v, k[1]) for v, k in zip(raw_row, kinds)
                    )
                    for raw_row in zip(*cols)
                ]
                for lo in range(0, len(rows), rows_per_block):
                    block = rows[lo : lo + rows_per_block]
                    f.write(_encode_block(block, kinds, codec))
                    n_rows += len(block)
        os.replace(tmp_name, fname)
        yield pa.RecordBatch.from_pydict(
            {"shard": [fname], "n_rows": [n_rows]},
            schema=pa.schema(
                [("shard", pa.string()), ("n_rows", pa.int64())]
            ),
        )

    out = df.repartition(n_shards) if n_shards else df
    manifest = out.mapInArrow(emit, "shard string, n_rows long").collect()
    return len(manifest)


def _arrow_type(dt: T.DataType):
    """Declared Spark field type → the Arrow type the decode emits.
    Timestamps are ``timestamp(us, UTC)``: the stored micros are
    ABSOLUTE instants, and a tz-aware Arrow column cannot be
    re-interpreted as session-local wall clock by a non-UTC session
    (which would shift every value by the tz offset)."""
    import pyarrow as pa

    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    return {
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.DoubleType(): pa.float64(),
        T.FloatType(): pa.float32(),
        T.BooleanType(): pa.bool_(),
        T.StringType(): pa.string(),
        T.BinaryType(): pa.binary(),
    }[dt]


def _decode_file_batch(content: bytes, fpath: str, declared: T.StructType):
    """One container file → one Arrow RecordBatch of the declared
    schema. Arrow end to end (never pandas): ``pa.array`` with
    ``from_pandas=False`` keeps None→null and NaN→NaN distinct — the
    pandas hop would silently nullify genuine NaN doubles."""
    import pyarrow as pa

    rec, rows = decode_container(content, fpath)
    _check_schema(rec, declared, fpath)
    names = [f.name for f in declared.fields]
    data = list(rows())
    cols = list(zip(*data)) if data else [[] for _ in names]
    arrays = [
        pa.array(list(col), type=_arrow_type(f.dataType), from_pandas=False)
        for col, f in zip(cols, declared.fields)
    ]
    return pa.RecordBatch.from_arrays(arrays, names)


def _decode_udf(declared: T.StructType):
    def decode(batches):
        for batch in batches:
            paths = batch.column(0).to_pylist()
            contents = batch.column(1).to_pylist()
            for fpath, content in zip(paths, contents):
                yield _decode_file_batch(bytes(content), str(fpath), declared)

    return decode


def read_avro(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read an Avro container directory/file with a declared schema.
    Every shard's embedded writer schema is checked against the
    declared one (drift fails loudly); decode runs one task per file
    via the binaryFile scan + mapInArrow."""
    files = spark.read.format("binaryFile").load(_glob(path))
    return files.select("path", "content").mapInArrow(
        _decode_udf(schema), schema
    )


def _glob(path: str) -> str:
    """Directory → ``<dir>/*.avro`` glob; a direct ``.avro`` file path
    passes through."""
    p = path.rstrip("/")
    return p if p.endswith(".avro") else f"{p}/*.avro"


_CORRUPT_FILE = "_corrupt_file"
_CORRUPT_ERROR = "_corrupt_error"


def read_avro_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Quarantine twin of ``read_avro`` — the line-format contract
    applied at this format's corruption granularity (the FILE): →
    (valid_rows, corrupt_files). A shard that fails decode (bad magic,
    sync-marker mismatch, schema drift, truncation) contributes ONE
    quarantine row ``(path, error)`` instead of failing the scan;
    every healthy shard's rows flow through untouched. Single decode
    pass: the marker travels as two extra nullable columns and both
    frames are prunable filters over it (no re-decode per frame)."""
    wide = T.StructType(
        [
            *schema.fields,
            T.StructField(_CORRUPT_FILE, T.StringType()),
            T.StructField(_CORRUPT_ERROR, T.StringType()),
        ]
    )

    def decode(batches):
        import pyarrow as pa

        str_t = pa.string()
        for batch in batches:
            paths = batch.column(0).to_pylist()
            contents = batch.column(1).to_pylist()
            for fpath, content in zip(paths, contents):
                try:
                    good = _decode_file_batch(
                        bytes(content), str(fpath), schema
                    )
                    n = good.num_rows
                    yield pa.RecordBatch.from_arrays(
                        [
                            *good.columns,
                            pa.nulls(n, str_t),
                            pa.nulls(n, str_t),
                        ],
                        [f.name for f in wide.fields],
                    )
                except Exception as e:  # quarantine, don't fail the scan
                    arrays = [
                        pa.nulls(1, _arrow_type(f.dataType))
                        for f in schema.fields
                    ]
                    arrays.append(pa.array([str(fpath)], str_t))
                    arrays.append(
                        pa.array(
                            [" ".join(str(e).split())[:500]], str_t
                        )
                    )
                    yield pa.RecordBatch.from_arrays(
                        arrays, [f.name for f in wide.fields]
                    )

    files = spark.read.format("binaryFile").load(_glob(path))
    flat = files.select("path", "content").mapInArrow(decode, wide)
    valid = flat.filter(F.col(_CORRUPT_FILE).isNull()).drop(
        _CORRUPT_FILE, _CORRUPT_ERROR
    )
    corrupt = flat.filter(F.col(_CORRUPT_FILE).isNotNull()).select(
        F.col(_CORRUPT_FILE).alias("path"),
        F.col(_CORRUPT_ERROR).alias("error"),
    )
    return valid, corrupt


def stream_avro(
    spark: SparkSession, src_dir: str, schema: T.StructType
) -> DataFrame:
    """Streaming twin of ``read_avro``: binaryFile file-source stream
    over arriving container shards, same explicit schema + writer-
    schema check, one decode task per arriving file."""
    bin_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    return files.select("path", "content").mapInArrow(
        _decode_udf(schema), schema
    )
