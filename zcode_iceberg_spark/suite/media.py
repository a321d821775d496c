"""Multimodal suite: binary payload decode + frame sampling via
mapInPandas (operators/media.py). The fake decode is byte arithmetic
over md5 bytes, so DuckDB reproduces it from the hex digest — the
Arrow/mapInPandas plumbing is what's actually under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zcode_iceberg_spark.operators import media as md
from zcode_iceberg_spark.operators.text import word_hash as tx_word_hash
from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite import Query


def with_payload(docs: DataFrame) -> DataFrame:
    """Test fixture: attach a deterministic 16-byte binary payload
    (md5 of the text) standing in for image/audio bytes, plus a
    media_type tag branded by ``doc_id % 3``. Lives in the suite (not
    operators/media.py) because the branding is fixture logic — the
    media operators themselves are payload-agnostic."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stub: payload → (width, height, channels, mean_byte)."""
    docs = load_table(spark, sf_dir, "documents")
    # fake decode pinned (md5-byte fixture payloads; see q_media_resize)
    dec = md.decode_media(with_payload(docs), use_real_decoder=False)
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
    return md.sample_frames(with_payload(docs), every_n=4)


SQL_MEDIA_FRAMES = f"""
SELECT doc_id, i AS frame_idx,
       CAST(concat('0x', substr(md5(text), 2 * (i * 4) + 1, 2)) AS INTEGER)
         AS frame_byte
FROM documents
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
WHERE doc_id % 3 = 2
"""


MIX_LANES = 4
TEXT_PER_BATCH = 6
IMG_PER_BATCH = 2


def q_modality_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-ratio-controlled batch assembly — the interleaving step
    a multimodal training pipeline needs: every batch holds exactly
    {TEXT_PER_BATCH} text samples and {IMG_PER_BATCH} image samples, in
    a deterministic shuffled order. Samples are sharded into
    {MIX_LANES} hash lanes FIRST (the seq_packing bounding move), then
    ranked per (lane, modality) by a salted hash and chopped into
    quota-sized batches; a lane keeps only batches both modalities can
    fill. No global sort: each lane's two windows are independent, so
    at 100 TB you grow lanes (per source × day × 2^k) and every rank
    stays bounded.

    Output: one row per placed sample with its (lane, batch, slot)
    position — directly a batch-writer's layout."""
    d = load_table(spark, sf_dir, "documents")
    u_lane = (
        tx_word_hash(F.concat(F.lit("mixlane:"), F.col("doc_id").cast("string")))
        % 1000000
    ) / 1000000.0
    base = d.select(
        "doc_id", F.floor(u_lane * MIX_LANES).cast("int").alias("lane")
    )
    text = base.withColumn("modality", F.lit("text"))
    image = base.filter(F.col("doc_id") % 3 == 0).withColumn(
        "modality", F.lit("image")
    )
    samples = text.unionByName(image)
    key = tx_word_hash(
        F.concat(F.lit("mix:"), F.col("modality"), F.lit(":"),
                 F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lane", "modality").orderBy(key, "doc_id")
    quota = F.when(F.col("modality") == "text", TEXT_PER_BATCH).otherwise(
        IMG_PER_BATCH
    )
    ranked = samples.withColumn("rk", F.row_number().over(w) - 1).select(
        "doc_id",
        "lane",
        "modality",
        F.floor(F.col("rk") / quota).cast("bigint").alias("batch_id"),
        (F.col("rk") % quota).cast("int").alias("slot"),
    )
    full = ranked.groupBy("lane", "batch_id").agg(
        F.sum(F.when(F.col("modality") == "text", 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("modality") == "image", 1).otherwise(0)).alias("ni"),
    ).filter(
        (F.col("nt") == TEXT_PER_BATCH) & (F.col("ni") == IMG_PER_BATCH)
    ).select("lane", "batch_id")
    return ranked.join(full, ["lane", "batch_id"]).select(
        "lane", "batch_id", "modality", "slot", "doc_id"
    )


_MIX_LANE_U = (
    "((CAST(concat('0x', substr(md5(concat('mixlane:', CAST(doc_id AS VARCHAR))), 1, 15)) "
    "AS BIGINT) % 2147483647) % 1000000) / 1000000.0"
)
_MIX_KEY = (
    "(CAST(concat('0x', substr(md5(concat('mix:', modality, ':', "
    "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 2147483647)"
)

SQL_MODALITY_INTERLEAVE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(floor(({_MIX_LANE_U}) * {MIX_LANES}) AS INTEGER) AS lane
  FROM documents
),
samples AS (
  SELECT doc_id, lane, 'text' AS modality FROM base
  UNION ALL
  SELECT doc_id, lane, 'image' AS modality FROM base WHERE doc_id % 3 = 0
),
ranked AS (
  SELECT doc_id, lane, modality,
         CAST(floor((row_number() OVER (PARTITION BY lane, modality
                                        ORDER BY {_MIX_KEY}, doc_id) - 1)
              / (CASE WHEN modality = 'text' THEN {TEXT_PER_BATCH}
                      ELSE {IMG_PER_BATCH} END)) AS BIGINT) AS batch_id,
         CAST((row_number() OVER (PARTITION BY lane, modality
                                  ORDER BY {_MIX_KEY}, doc_id) - 1)
              % (CASE WHEN modality = 'text' THEN {TEXT_PER_BATCH}
                      ELSE {IMG_PER_BATCH} END) AS INTEGER) AS slot
  FROM samples
),
full_b AS (
  SELECT lane, batch_id FROM ranked
  GROUP BY lane, batch_id
  HAVING sum(CASE WHEN modality = 'text' THEN 1 ELSE 0 END)
           = {TEXT_PER_BATCH}
     AND sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END)
           = {IMG_PER_BATCH}
)
SELECT r.lane, r.batch_id, r.modality, r.slot, r.doc_id
FROM ranked r JOIN full_b f
  ON r.lane = f.lane AND r.batch_id = f.batch_id
"""


RZ_W = 8
RZ_H = 8


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor thumbnail pass over the image payloads: the
    virtual (width × height) image resamples to {RZ_W}×{RZ_H} inside
    the same Arrow-batched ``mapInPandas`` seam the decoder uses
    (operators/media.py:resize_media) — N input rows contract to the
    image-only subset, one row per thumbnail, resized pixel sum kept
    as an exact integer so the hash is byte-arithmetic-deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    # fake decode pinned: the fixture payloads are md5 bytes, not image
    # files, so the auto codec probe must not pick a real PIL path here
    rz = md.resize_media(
        with_payload(docs), out_w=RZ_W, out_h=RZ_H, use_real_decoder=False
    )
    return rz.select(
        "doc_id",
        "out_w",
        "out_h",
        "resized_sum",
        F.round("resized_mean", 6).alias("resized_mean"),
    )


SQL_MEDIA_RESIZE = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST(concat('0x', substr(md5(text), 2 * i + 1, 2))
                     AS INTEGER)) AS pb
  FROM documents WHERE doc_id % 3 = 0
), dims AS (
  SELECT doc_id, pb, 64 + pb[1] % 192 AS w, 64 + pb[2] % 192 AS h FROM px
), samp AS (
  SELECT doc_id,
         list_reduce(list_transform(generate_series(0, {RZ_W * RZ_H - 1}),
           i -> pb[1 + ((((i // {RZ_W}) * h) // {RZ_H}) * w
                        + (((i % {RZ_W}) * w) // {RZ_W})) % 16]),
           (a, b) -> a + b) AS s
  FROM dims
)
SELECT doc_id, {RZ_W} AS out_w, {RZ_H} AS out_h,
       CAST(s AS BIGINT) AS resized_sum,
       round(CAST(s AS DOUBLE) / {RZ_W * RZ_H}.0, 6) AS resized_mean
FROM samp
"""


# ------------------------------------------------ perceptual-hash near-dup

DHASH_MAX_HAM = 6  # near-dup threshold (standard dHash operating point)
DHASH_MAX_BUCKET = 64  # band buckets above this sub-slice (hot-block rule)
DHASH_SLICE_BITS = 4  # 16 sub-slices per hot bucket


def q_media_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup by perceptual difference hash: each image's
    64-bit dHash (operators/media.py:dhash_media — 9×8 grayscale grid,
    adjacent-pixel compares, via the Arrow mapInPandas seam) is split
    into four 16-bit BANDS; candidate pairs are an EQUI-join on
    (band_idx, band_val) — the Hamming-space twin of the MinHash LSH
    banding (any pair within Hamming {DHASH_MAX_HAM} of the threshold
    band profile collides in ≥1 band when the differing bits miss a
    band; exact duplicates collide in all four) — then rescored with
    the EXACT Hamming distance and flagged at ≤{DHASH_MAX_HAM}. The
    multimodal member of the dedup family: same
    bucket-join-then-rescore shape as lsh_candidates → dedup_near.

    Scale shape: hashes are one mapInPandas pass over the image scan
    (no shuffle); the band join keys on 16-bit buckets so only
    colliding candidates pair; the Hamming rescore is pure arithmetic
    (bit-extraction folds, no dialect bit operators) on the ≤K
    candidate rows. Exact-integer columns throughout."""
    docs = load_table(spark, sf_dir, "documents")
    # fake decode pinned (md5-byte fixture payloads, like media_resize)
    dh = md.dhash_media(with_payload(docs), use_real_decoder=False)
    raw_bands = dh.select(
        "doc_id",
        "dh_lo",
        "dh_hi",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band_idx"),
                    (F.col("dh_lo") % 65536).alias("band_val"),
                ),
                F.struct(
                    F.lit(1).alias("band_idx"),
                    (F.col("dh_lo") / F.lit(65536)).cast("long").alias(
                        "band_val"
                    ),
                ),
                F.struct(
                    F.lit(2).alias("band_idx"),
                    (F.col("dh_hi") % 65536).alias("band_val"),
                ),
                F.struct(
                    F.lit(3).alias("band_idx"),
                    (F.col("dh_hi") / F.lit(65536)).cast("long").alias(
                        "band_val"
                    ),
                ),
            )
        ).alias("b"),
    ).select(
        "doc_id", "dh_lo", "dh_hi",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    )
    # Hot-bucket bound (the embedding_neardup/hot_block_slice rule for
    # Hamming space): dHash is KNOWN to degenerate on flat/gradient
    # images — alternating-bit bands (0xAAAA/0x5555) collect thousands
    # of members at corpus scale (measured: 2.4k-member buckets on the
    # 100× replica → tens of millions of candidate pairs, 43 s).
    # Buckets above DHASH_MAX_BUCKET sub-slice by the OPPOSITE half's
    # top {DHASH_SLICE_BITS} bits, so a near-dup pair keeps colliding
    # in the sliced band unless one of its ≤{DHASH_MAX_HAM} differing
    # bits lands in those slice bits — and it still has the other
    # three bands regardless (recall ≤ the unsliced join's by
    # construction, the ann_ivf_bounded monotonicity discipline).
    wb = Window.partitionBy("band_idx", "band_val")
    sub = F.when(
        F.count(F.lit(1)).over(wb) > DHASH_MAX_BUCKET,
        F.expr(
            f"(CASE WHEN band_idx <= 1 THEN dh_hi ELSE dh_lo END) "
            f"DIV {1 << (32 - DHASH_SLICE_BITS)}"
        ),
    ).otherwise(F.lit(0).cast("long"))
    bands = raw_bands.withColumn("sub", sub)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.dh_lo").alias("lo1"),
            F.col("a.dh_hi").alias("hi1"),
            F.col("b.dh_lo").alias("lo2"),
            F.col("b.dh_hi").alias("hi2"),
        )
        .distinct()
    )
    ham = F.expr(
        _ham32_sql("lo1", "lo2", "DIV") + " + " + _ham32_sql("hi1", "hi2", "DIV")
    )
    return pairs.select(
        "doc1",
        "doc2",
        ham.cast("int").alias("hamming"),
        (ham <= DHASH_MAX_HAM).alias("is_near_dup"),
    )


def _ham32_sql(a: str, b: str, idiv: str) -> str:
    """Hamming distance of two unsigned-32-bit-in-BIGINT values as
    pure arithmetic — bit b of x is (x idiv 2^b) % 2, XOR is sum mod
    2 — so both engines evaluate one identical formula (no dialect
    bit operators; the zorder_layout convention)."""
    terms = [
        f"((({a} {idiv} {1 << k}) % 2 + ({b} {idiv} {1 << k}) % 2) % 2)"
        for k in range(32)
    ]
    return "(" + " + ".join(terms) + ")"


def _dhash_sql_cte() -> str:
    """dHash from the md5-byte fixture payloads in SQL: the same 9×8
    virtual-image grid rule the fake decoder uses, bits packed into
    two 32-bit halves with integer shifts."""
    grid = (
        "list_transform(generate_series(0, 71), i -> "
        "pb[1 + ((((i // 9) * h) // 8) * w + (((i % 9) * w) // 9)) % 16])"
    )

    def half(lo_bit: int) -> str:
        terms = []
        for b in range(lo_bit, lo_bit + 32):
            y, x = b // 8, b % 8
            terms.append(
                f"CASE WHEN g[{y * 9 + x + 1}] > g[{y * 9 + x + 2}] "
                f"THEN CAST({1 << (b - lo_bit)} AS BIGINT) ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    return f"""px AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST(concat('0x', substr(md5(text), 2 * i + 1, 2))
                     AS INTEGER)) AS pb
  FROM documents WHERE doc_id % 3 = 0
),
dims AS (
  SELECT doc_id, pb, 64 + pb[1] % 192 AS w, 64 + pb[2] % 192 AS h FROM px
),
grids AS (
  SELECT doc_id, {grid} AS g FROM dims
),
dh AS (
  SELECT doc_id, {half(0)} AS dh_lo, {half(32)} AS dh_hi FROM grids
)"""


SQL_MEDIA_DHASH = f"""
WITH {_dhash_sql_cte()},
raw_bands AS (
  SELECT doc_id, dh_lo, dh_hi, 0 AS band_idx, dh_lo % 65536 AS band_val
  FROM dh
  UNION ALL
  SELECT doc_id, dh_lo, dh_hi, 1, dh_lo // 65536 FROM dh
  UNION ALL
  SELECT doc_id, dh_lo, dh_hi, 2, dh_hi % 65536 FROM dh
  UNION ALL
  SELECT doc_id, dh_lo, dh_hi, 3, dh_hi // 65536 FROM dh
),
bands AS (
  SELECT doc_id, dh_lo, dh_hi, band_idx, band_val,
         CASE WHEN count(*) OVER (PARTITION BY band_idx, band_val)
                   > {DHASH_MAX_BUCKET}
              THEN (CASE WHEN band_idx <= 1 THEN dh_hi ELSE dh_lo END)
                   // {1 << (32 - DHASH_SLICE_BITS)}
              ELSE CAST(0 AS BIGINT) END AS sub
  FROM raw_bands
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
         a.dh_lo AS lo1, a.dh_hi AS hi1, b.dh_lo AS lo2, b.dh_hi AS hi2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.sub = b.sub
   AND a.doc_id < b.doc_id
)
SELECT doc1, doc2,
       CAST({_ham32_sql('lo1', 'lo2', '//')}
            + {_ham32_sql('hi1', 'hi2', '//')} AS INTEGER) AS hamming,
       ({_ham32_sql('lo1', 'lo2', '//')}
        + {_ham32_sql('hi1', 'hi2', '//')}) <= {DHASH_MAX_HAM}
         AS is_near_dup
FROM pairs
"""


QUERIES = {
    "media_features": Query(q_media_features, SQL_MEDIA_FEATURES),
    "media_dhash": Query(q_media_dhash, SQL_MEDIA_DHASH),
    "media_frames": Query(q_media_frames, SQL_MEDIA_FRAMES),
    "media_resize": Query(q_media_resize, SQL_MEDIA_RESIZE),
    "modality_interleave": Query(q_modality_interleave, SQL_MODALITY_INTERLEAVE),
}
