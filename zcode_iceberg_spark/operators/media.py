"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Driver-mandated extension (BASELINE north star). The container has no
image/audio libraries, so the DECODE step has three tiers:

- ``use_real_decoder=True`` decodes for real: PIL when importable,
  else the pure-Python BMP/PPM codec (operators/imagecodec.py — the
  Avro-codec precedent applied to images), so the real path executes
  LIVE in this container on BMP/PPM payloads;
  ``NotImplementedError`` now marks only formats neither backend
  covers (JPEG/PNG/audio/video without PIL/ffmpeg);
- the default auto mode stays PIL-probed, so the oracle fixtures
  (md5 bytes, not image files) keep taking the fake path here;
- the fake path derives deterministic metadata from the payload
  bytes, so the Spark-side plumbing — binary schema, Arrow batch
  shape, partition-parallel UDF execution — is REAL and
  oracle-checkable (pure byte arithmetic DuckDB can reproduce).

Operators here are payload-agnostic: they consume any frame with
``(doc_id, payload: binary, media_type: string)`` columns. The
deterministic md5-bytes test fixture lives in ``suite/media.py``
(``with_payload``), keeping fixture branding out of the operator
surface.

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


def _pil_image():
    """Codec probe: the PIL Image module if importable, else None.
    Called on the EXECUTOR inside the mapInPandas closure (workers
    decide from their own environment, nothing is pickled)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _resolve_real(use_real_decoder: bool | None) -> bool:
    """``None`` → auto: real codec iff PIL is importable (probed on
    the driver; homogeneous clusters are assumed — mixed worker
    environments should pin the flag explicitly)."""
    if use_real_decoder is None:
        return _pil_image() is not None
    return use_real_decoder


def decode_media(
    media: DataFrame, use_real_decoder: bool | None = None
) -> DataFrame:
    """Decode payloads into typed metadata via mapInPandas.

    ``use_real_decoder=None`` (default) auto-selects: PIL decode when
    the codec is importable, else the deterministic fake. ``False``
    pins the fake (what the oracle suite uses — its fixture payloads
    are md5 bytes, not image files); ``True`` demands a real codec:
    PIL when importable, else the built-in pure-Python BMP/PPM
    decoder — ``NotImplementedError`` only for formats neither
    backend covers.

    Fake decode: width/height/channels derived from payload bytes —
    deterministic, oracle-checkable byte arithmetic. Real decode:
    ``PIL.Image.open`` per payload; channels = band count, mean_byte =
    mean over decoded pixel-band bytes.
    """
    real = _resolve_real(use_real_decoder)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image() if real else None
        for pdf in batches:
            if real:
                import io  # noqa: PLC0415

                from zcode_iceberg_spark.operators import (  # noqa: PLC0415
                    imagecodec,
                )

                rows = []
                for doc_id, payload, mtype in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_type"]
                ):
                    if mtype != "image":
                        # only images decode; audio/video rows keep
                        # their identity/length metadata and null
                        # decode fields (same 1→1 cardinality as the
                        # fake path, which is modality-agnostic)
                        rows.append(
                            (int(doc_id), mtype, len(payload),
                             None, None, None, None)
                        )
                        continue
                    if Image is not None:
                        im = Image.open(io.BytesIO(payload))
                        w, h, nch = im.width, im.height, len(im.getbands())
                        px = im.tobytes()
                    else:  # pure-Python BMP/PPM fallback; raises
                        # NotImplementedError on uncovered formats
                        w, h, nch, px = imagecodec.decode_image(payload)
                    rows.append(
                        (
                            int(doc_id),
                            mtype,
                            len(payload),
                            w,
                            h,
                            nch,
                            float(sum(px)) / len(px) if px else 0.0,
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "media_type", "payload_len",
                        "width", "height", "channels", "mean_byte",
                    ],
                )
                continue
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
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Nearest-neighbor resize stub for image payloads: the virtual
    (width × height) single-channel image whose pixel (x, y) is
    ``payload[(y·width + x) mod len]`` is resampled to (out_w, out_h)
    with the standard NN index map ``src = (dst · src_dim) // dst_dim``
    — the same arithmetic a real thumbnail pass runs, minus the codec.
    One output row per image (audio/video rows pass through the batch
    untouched and are dropped), carrying the resized pixel sum (exact
    integer) and mean.

    Real-decoder seam (``use_real_decoder=None`` auto-probes PIL like
    ``decode_media``): with PIL the real path opens the payload,
    converts to grayscale, ``Image.resize((out_w, out_h), NEAREST)``
    and sums the thumbnail pixels; without PIL the built-in BMP/PPM
    codec decodes and the shared integer-luma NN thumbnail does the
    same (operators/imagecodec.py:gray_nearest_thumb) —
    ``NotImplementedError`` only for formats neither covers. The
    Arrow batch shape, per-split parallelism, and N→M row contraction
    are the real thing on all paths.
    """
    real = _resolve_real(use_real_decoder)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image() if real else None
        for pdf in batches:
            if real:
                import io  # noqa: PLC0415

                from zcode_iceberg_spark.operators import (  # noqa: PLC0415
                    imagecodec,
                )

                rows = []
                for doc_id, payload, mtype in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_type"]
                ):
                    if mtype != "image":
                        continue
                    if Image is not None:
                        im = Image.open(io.BytesIO(payload)).convert("L")
                        thumb = im.resize((out_w, out_h), Image.NEAREST)
                        total = sum(thumb.tobytes())
                    else:
                        w, h, nch, px = imagecodec.decode_image(payload)
                        total = sum(
                            imagecodec.gray_nearest_thumb(
                                w, h, nch, px, out_w, out_h
                            )
                        )
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
                        "doc_id", "out_w", "out_h",
                        "resized_sum", "resized_mean",
                    ],
                )
                continue
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


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dh_lo", T.LongType()),
        T.StructField("dh_hi", T.LongType()),
    ]
)


def _dhash_bits(grid: list[int]) -> tuple[int, int]:
    """64-bit difference hash from a 9×8 grayscale grid (row-major,
    9 columns): bit (y·8 + x) = 1 iff g[y][x] > g[y][x+1]. Returned as
    two unsigned 32-bit halves so neither engine touches the sign bit."""
    lo = hi = 0
    for b in range(64):
        y, x = b // 8, b % 8
        if grid[y * 9 + x] > grid[y * 9 + x + 1]:
            if b < 32:
                lo |= 1 << b
            else:
                hi |= 1 << (b - 32)
    return lo, hi


def dhash_media(
    media: DataFrame, use_real_decoder: bool | None = None
) -> DataFrame:
    """Perceptual difference-hash (dHash, Krawetz) for image payloads:
    grayscale → 9×8 nearest-neighbor grid → adjacent-pixel compare →
    64-bit hash carried as two 32-bit halves — the standard cheap
    image near-dup fingerprint (robust to rescale/recompress; Hamming
    distance ≈ perceptual distance). One row per image via the same
    Arrow-batched ``mapInPandas`` seam as decode/resize; the fake
    path's virtual image is the identical pixel rule ``resize_media``
    uses, so the oracle replays the hash from payload bytes."""
    real = _resolve_real(use_real_decoder)
    out_w, out_h = 9, 8

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image() if real else None
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image":
                    continue
                if real:
                    import io  # noqa: PLC0415

                    from zcode_iceberg_spark.operators import (  # noqa: PLC0415
                        imagecodec,
                    )

                    if Image is not None:
                        im = Image.open(io.BytesIO(payload)).convert("L")
                        grid = list(
                            im.resize((out_w, out_h), Image.NEAREST).tobytes()
                        )
                    else:
                        w, h, nch, px = imagecodec.decode_image(payload)
                        grid = list(
                            imagecodec.gray_nearest_thumb(
                                w, h, nch, px, out_w, out_h
                            )
                        )
                else:
                    n = len(payload)
                    w = 64 + payload[0] % 192
                    h = 64 + payload[1] % 192
                    grid = [
                        payload[
                            (((y * h) // out_h) * w + ((x * w) // out_w)) % n
                        ]
                        for y in range(out_h)
                        for x in range(out_w)
                    ]
                lo, hi = _dhash_bits(grid)
                rows.append((int(doc_id), lo, hi))
            yield pd.DataFrame(rows, columns=["doc_id", "dh_lo", "dh_hi"])

    return media.mapInPandas(dhash, DHASH_SCHEMA)


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
