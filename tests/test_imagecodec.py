"""Pure-Python BMP/PPM codec (operators/imagecodec.py) + the live
real-decode media path it unlocks. The encoders here are written in
the TEST, straight from the specs, so decode is checked against an
independent byte layout — never against its own inverse.
"""

from __future__ import annotations

import struct

import pytest

from zcode_iceberg_spark.operators import imagecodec as C


def encode_bmp(width, height, rgb_rows, top_down=False, bpp=24):
    """Independent 24/32-bit BI_RGB BMP encoder: BITMAPFILEHEADER +
    BITMAPINFOHEADER, BGR(A) storage, 4-byte row padding, bottom-up
    unless top_down. ``rgb_rows`` is top-down rows of (r, g, b[, a])
    tuples."""
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    pixel_off = 14 + 40
    body = bytearray()
    rows = rgb_rows if top_down else list(reversed(rgb_rows))
    for row in rows:
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # B, G, R
            if nch == 4:
                line += bytes([px[3]])
        line += b"\x00" * (stride - len(line))
        body += line
    raw_h = -height if top_down else height
    hdr = b"BM" + struct.pack(
        "<IHHI", pixel_off + len(body), 0, 0, pixel_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, raw_h, 1, bpp, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(hdr + info + body)


def encode_ppm(width, height, rgb_rows, comment=True):
    head = b"P6\n"
    if comment:
        head += b"# independent test encoder\n"
    head += f"{width} {height}\n255\n".encode()
    body = bytearray()
    for row in rgb_rows:
        for r, g, b in row:
            body += bytes([r, g, b])
    return bytes(head + body)


PIXELS = [  # 4×2 top-down RGB image with distinct channel values
    [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)],
    [(1, 2, 3), (200, 100, 50), (0, 0, 0), (255, 255, 255)],
]
FLAT = bytes(v for row in PIXELS for px in row for v in px)


def test_bmp_bottom_up_with_padding():
    w, h, nch, px = C.decode_bmp(encode_bmp(4, 2, PIXELS))
    assert (w, h, nch) == (4, 2, 3)
    assert px == FLAT  # flipped back to top-down, BGR→RGB swapped


def test_bmp_top_down_negative_height():
    w, h, nch, px = C.decode_bmp(encode_bmp(4, 2, PIXELS, top_down=True))
    assert (w, h, nch) == (4, 2, 3)
    assert px == FLAT


def test_bmp_32bpp_alpha():
    rows = [[(r, g, b, 128 + i) for i, (r, g, b) in enumerate(row)]
            for row in PIXELS]
    w, h, nch, px = C.decode_bmp(encode_bmp(4, 2, rows, bpp=32))
    assert (w, h, nch) == (4, 2, 4)
    flat = bytes(v for row in rows for p in row for v in p)
    assert px == flat


def test_bmp_rejects_unsupported():
    payload = bytearray(encode_bmp(4, 2, PIXELS))
    struct.pack_into("<I", payload, 30, 1)  # RLE8 compression
    with pytest.raises(NotImplementedError):
        C.decode_bmp(bytes(payload))
    with pytest.raises(ValueError):
        C.decode_bmp(encode_bmp(4, 2, PIXELS)[:30])  # truncated


def test_ppm_with_comment_header():
    w, h, nch, px = C.decode_ppm(encode_ppm(4, 2, PIXELS))
    assert (w, h, nch) == (4, 2, 3)
    assert px == FLAT


def test_decode_image_dispatch_and_seam():
    assert C.decode_image(encode_bmp(4, 2, PIXELS))[3] == FLAT
    assert C.decode_image(encode_ppm(4, 2, PIXELS))[3] == FLAT
    with pytest.raises(NotImplementedError):
        C.decode_image(b"\x89PNG\r\n\x1a\n garbage")


def test_gray_thumb_known_values():
    """2×2 thumbnail of the 4×2 fixture: NN picks src rows (0, 1) and
    src cols (0, 2); luma computed independently here."""

    def luma(r, g, b):
        return (299 * r + 587 * g + 114 * b) // 1000

    got = C.gray_nearest_thumb(4, 2, 3, FLAT, 2, 2)
    want = [
        luma(*PIXELS[0][0]), luma(*PIXELS[0][2]),
        luma(*PIXELS[1][0]), luma(*PIXELS[1][2]),
    ]
    assert got == want


def test_roundtrip_random_images():
    import random

    rnd = random.Random(42)
    for trial in range(8):
        w = rnd.randint(1, 9)
        h = rnd.randint(1, 6)
        rows = [
            [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        flat = bytes(v for row in rows for p in row for v in p)
        for blob in (
            encode_bmp(w, h, rows, top_down=bool(trial % 2)),
            encode_ppm(w, h, rows, comment=bool(trial % 2)),
        ):
            dw, dh, nch, px = C.decode_image(blob)
            assert (dw, dh, nch, px) == (w, h, 3, flat)


def _real_gray_thumb(blob, out_w, out_h):
    """Expected grayscale NN thumbnail pixels for the use_real_decoder
    path, computed with the SAME backend the executors will pick (PIL
    when importable, else the builtin codec) — PIL's rounded luma and
    NEAREST sampling differ from the builtin's floor-luma /
    (dst*src)//dst map, so expectations must be per-backend (ADVICE
    r8). Decoded RGB bytes are identical either way (both lossless)."""
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        im = Image.open(io.BytesIO(blob)).convert("L")
        return list(im.resize((out_w, out_h), Image.NEAREST).tobytes())
    except ImportError:
        w, h, nch, px = C.decode_image(blob)
        return list(C.gray_nearest_thumb(w, h, nch, px, out_w, out_h))


def test_real_decode_path_runs_in_spark(spark):
    """The use_real_decoder=True path executes LIVE on real image
    bytes in this codec-less container (closing the r7 'real-decode
    never executed' gap): metadata and thumbnail sums match values
    computed independently from the known pixels."""
    from zcode_iceberg_spark.operators.media import decode_media, resize_media

    bmp = encode_bmp(4, 2, PIXELS)
    ppm = encode_ppm(4, 2, PIXELS)
    df = spark.createDataFrame(
        [(1, bmp, "image"), (2, ppm, "image"), (3, b"not-an-image", "audio")],
        "doc_id long, payload binary, media_type string",
    ).repartition(2)

    meta = {r["doc_id"]: r for r in decode_media(df, use_real_decoder=True).collect()}
    mean = sum(FLAT) / len(FLAT)
    for did, blob in ((1, bmp), (2, ppm)):
        r = meta[did]
        assert (r["width"], r["height"], r["channels"]) == (4, 2, 3)
        assert r["payload_len"] == len(blob)
        assert abs(r["mean_byte"] - mean) < 1e-12
    assert meta[3]["width"] is None  # non-image: metadata only

    thumbs = {
        r["doc_id"]: r
        for r in resize_media(df, 2, 2, use_real_decoder=True).collect()
    }
    assert set(thumbs) == {1, 2}  # audio row dropped by the N→M contract
    for did, blob in ((1, bmp), (2, ppm)):
        want = sum(_real_gray_thumb(blob, 2, 2))
        assert thumbs[did]["resized_sum"] == want
        assert thumbs[did]["resized_mean"] == want / 4.0


def test_real_dhash_path_runs_in_spark(spark):
    """dhash_media's use_real_decoder=True path executes LIVE on real
    BMP/PPM bytes: both encodings of the same pixels produce the SAME
    hash (format-invariance — the point of a perceptual hash), and it
    equals the hash computed independently from the known pixels via
    the shared grayscale-thumbnail kernel."""
    from zcode_iceberg_spark.operators.media import _dhash_bits, dhash_media

    bmp = encode_bmp(4, 2, PIXELS)
    ppm = encode_ppm(4, 2, PIXELS)
    df = spark.createDataFrame(
        [(1, bmp, "image"), (2, ppm, "image"), (3, b"zz", "audio")],
        "doc_id long, payload binary, media_type string",
    ).repartition(2)
    got = {
        r["doc_id"]: (r["dh_lo"], r["dh_hi"])
        for r in dhash_media(df, use_real_decoder=True).collect()
    }
    want = _dhash_bits(_real_gray_thumb(bmp, 9, 8))
    assert set(got) == {1, 2}  # audio row dropped
    assert got[1] == got[2] == want
