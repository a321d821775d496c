"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Driver-mandated extension (BASELINE north star). The container has no
image/audio libraries, so the DECODE step is stubbed two ways:

- ``use_real_decoder=True`` raises ``NotImplementedError`` at the
  exact seam where PIL/ffmpeg would plug in (clearly-marked stub);
- the default path derives deterministic fake metadata from the
  payload bytes, so the Spark-side plumbing — binary schema, Arrow
  batch shape, partition-parallel UDF execution — is REAL and
  oracle-checkable (the fake decode is pure byte arithmetic DuckDB
  can reproduce from the same md5 bytes).

Scale notes: mapInPandas streams Arrow record batches — payloads never
materialize on the driver; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Partitioning is
inherited from the scan, so decode parallelism == input splits, the
right shape for a 100 TB binary-blob table (each task decodes its
split; no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_byte", T.IntegerType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 16-byte binary payload (md5 of the text)
    standing in for image/audio bytes, plus a media_type tag."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


def decode_media(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode payloads into typed metadata via mapInPandas.

    Fake decode (default): width/height/channels derived from payload
    bytes — deterministic, oracle-checkable byte arithmetic.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                # real seam: PIL.Image.open(io.BytesIO(payload)) etc.
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg (not in container)"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "payload_len": payloads.map(len).astype("int32"),
                    "width": payloads.map(lambda b: 64 + b[0] % 192).astype("int32"),
                    "height": payloads.map(lambda b: 64 + b[1] % 192).astype("int32"),
                    "channels": payloads.map(lambda b: 1 + b[2] % 4).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b)
                    ).astype("float64"),
                }
            )
            yield out

    return media.mapInPandas(decode, MEDIA_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized_sum", T.LongType()),
        T.StructField("resized_mean", T.DoubleType()),
    ]
)


def resize_media(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Nearest-neighbor resize stub for image payloads: the virtual
    (width × height) single-channel image whose pixel (x, y) is
    ``payload[(y·width + x) mod len]`` is resampled to (out_w, out_h)
    with the standard NN index map ``src = (dst · src_dim) // dst_dim``
    — the same arithmetic a real thumbnail pass runs, minus the codec.
    One output row per image (audio/video rows pass through the batch
    untouched and are dropped), carrying the resized pixel sum (exact
    integer) and mean.

    Real-decoder seam: ``use_real_decoder=True`` raises at the exact
    point where ``PIL.Image.resize`` would take over; the Arrow batch
    shape, per-split parallelism, and N→M row contraction are the real
    thing either way.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                # real seam: PIL.Image.open(...).resize((out_w, out_h))
                raise NotImplementedError(
                    "real image resizing requires PIL (not in container)"
                )
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image":
                    continue
                n = len(payload)
                w = 64 + payload[0] % 192
                h = 64 + payload[1] % 192
                total = 0
                for y in range(out_h):
                    src_y = (y * h) // out_h
                    for x in range(out_w):
                        src_x = (x * w) // out_w
                        total += payload[(src_y * w + src_x) % n]
                rows.append(
                    (
                        int(doc_id),
                        out_w,
                        out_h,
                        int(total),
                        float(total) / (out_w * out_h),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "out_w", "out_h", "resized_sum", "resized_mean"
                ],
            )

    return media.mapInPandas(resize, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling stub for video payloads: one row per sampled
    byte offset (stand-in for frame extraction at stride n) —
    demonstrates the 1→N mapInPandas fan-out batch shape."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                for idx, off in enumerate(range(0, len(payload), every_n)):
                    rows.append((int(doc_id), idx, int(payload[off])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_byte"]
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)
