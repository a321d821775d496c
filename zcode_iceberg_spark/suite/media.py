"""Multimodal suite: binary payload decode + frame sampling via
mapInPandas (operators/media.py). The fake decode is byte arithmetic
over md5 bytes, so DuckDB reproduces it from the hex digest — the
Arrow/mapInPandas plumbing is what's actually under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zcode_iceberg_spark.operators import media as md
from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite import Query


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stub: payload → (width, height, channels, mean_byte)."""
    docs = load_table(spark, sf_dir, "documents")
    dec = md.decode_media(md.with_payload(docs))
    return dec.select(
        "doc_id",
        "media_type",
        "payload_len",
        "width",
        "height",
        "channels",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


# hex-pair n of md5 = payload byte n → identical byte arithmetic
def _byte(n: int) -> str:
    return f"CAST(concat('0x', substr(md5(text), {2 * n + 1}, 2)) AS INTEGER)"


_MEAN = (
    "(list_reduce(list_transform(generate_series(0, 15), "
    "i -> CAST(CAST(concat('0x', substr(md5(text), 2 * i + 1, 2)) AS INTEGER) "
    "AS DOUBLE)), (a, b) -> a + b) / 16.0)"
)

SQL_MEDIA_FEATURES = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       16 AS payload_len,
       64 + {_byte(0)} % 192 AS width,
       64 + {_byte(1)} % 192 AS height,
       1 + {_byte(2)} % 4 AS channels,
       round({_MEAN}, 6) AS mean_byte
FROM documents
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out: every-4th byte of video payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return md.sample_frames(md.with_payload(docs), every_n=4)


SQL_MEDIA_FRAMES = f"""
SELECT doc_id, i AS frame_idx,
       CAST(concat('0x', substr(md5(text), 2 * (i * 4) + 1, 2)) AS INTEGER)
         AS frame_byte
FROM documents
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
WHERE doc_id % 3 = 2
"""


QUERIES = {
    "media_features": Query(q_media_features, SQL_MEDIA_FEATURES),
    "media_frames": Query(q_media_frames, SQL_MEDIA_FRAMES),
}
