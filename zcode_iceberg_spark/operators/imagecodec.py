"""Pure-Python image codecs: uncompressed BMP (24/32-bit BI_RGB) and
binary PPM (P6).

The escape hatch that lets the REAL-decode media path execute in a
codec-less container (the pure-Python Avro codec set the precedent:
no jar → spec-following Python twin). ``operators/media.py`` probes
PIL first and falls back here, so ``use_real_decoder=True`` now runs
live on BMP/PPM fixtures instead of raising; formats outside these
two (JPEG, PNG, ...) still raise ``NotImplementedError`` at the same
seam — this is a working floor, not a PIL replacement.

Decoders follow the published specs directly (BITMAPFILEHEADER /
BITMAPINFOHEADER layout; 4-byte BMP row padding; bottom-up vs
negative-height top-down; PPM P6 whitespace-and-comment header
grammar) and are tested against hand-packed byte fixtures and an
independent encoder that lives in the TESTS, not here
(tests/test_imagecodec.py) — the decode direction never checks
itself against its own inverse.

Scale note: these run inside the same Arrow-batched ``mapInPandas``
closures as the PIL path — per-split parallelism, payloads never on
the driver. Pure-Python per-pixel cost is fine for the fixture sizes
tested here; a production cluster would carry PIL and never reach
this fallback.
"""

from __future__ import annotations

import struct

GRAY_WEIGHTS = (299, 587, 114)  # ITU-R 601-2 luma, integer per-mille


def sniff(payload: bytes) -> str | None:
    """'bmp' / 'ppm' when the magic matches a supported format."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    return None


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — pixels are top-down
    row-major RGB(A) bytes. Supports the uncompressed BI_RGB subset
    at 24/32 bpp with a BITMAPINFOHEADER-or-later header; bottom-up
    rows (positive height) are flipped to top-down, BGR storage order
    is swapped to RGB, and 4-byte row padding is stripped."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 14 + 40:  # file header + minimum info header
        raise ValueError("BMP truncated before header end")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core header v{hdr_size} unsupported")
    width, raw_h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} unsupported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP {bpp} bpp unsupported")
    if width <= 0 or raw_h == 0 or planes != 1:
        raise ValueError("malformed BMP dimensions")
    height, top_down = abs(raw_h), raw_h < 0
    nch = bpp // 8
    stride = (width * nch + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + stride * height
    if len(payload) < need:
        raise ValueError(f"BMP truncated: {len(payload)} < {need}")
    out = bytearray(width * height * nch)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = pixel_off + src_row * stride
        dst = row * width * nch
        for x in range(width):
            px = base + x * nch
            # stored B,G,R(,A) → emitted R,G,B(,A)
            out[dst] = payload[px + 2]
            out[dst + 1] = payload[px + 1]
            out[dst + 2] = payload[px]
            if nch == 4:
                out[dst + 3] = payload[px + 3]
            dst += nch
    return width, height, nch, bytes(out)


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, pixels) for binary PPM (P6): header is the
    magic plus three whitespace-separated decimal fields (width,
    height, maxval), with ``#`` comments allowed between tokens, then
    exactly ONE whitespace byte before the raw RGB samples."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos] == ord("#"):
            while pos < len(payload) and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported")
    pos += 1  # the single post-maxval whitespace byte
    need = width * height * 3
    if len(payload) < pos + need:
        raise ValueError("PPM truncated")
    return width, height, 3, payload[pos : pos + need]


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic; raises ``NotImplementedError`` for formats
    the built-in codec does not cover (the live probe seam —
    operators/media.py reports it as the missing-codec condition)."""
    fmt = sniff(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    raise NotImplementedError(
        "built-in codec supports BMP/PPM only; install PIL for other formats"
    )


def gray_pixel(px: bytes | bytearray, off: int) -> int:
    """Integer ITU-R 601-2 luma of the RGB triple at ``off`` —
    (299·R + 587·G + 114·B) // 1000, the deterministic grayscale both
    the thumbnail path and its tests share."""
    r, g, b = px[off], px[off + 1], px[off + 2]
    w = GRAY_WEIGHTS
    return (w[0] * r + w[1] * g + w[2] * b) // 1000


def gray_nearest_thumb(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    out_w: int,
    out_h: int,
) -> list[int]:
    """Grayscale nearest-neighbor thumbnail as a flat row-major list:
    the standard NN index map ``src = (dst · src_dim) // dst_dim``
    over luma values — the same arithmetic the fake-decode resize path
    runs, now against genuinely decoded pixels."""
    out = []
    for y in range(out_h):
        src_y = (y * height) // out_h
        for x in range(out_w):
            src_x = (x * width) // out_w
            off = (src_y * width + src_x) * channels
            out.append(gray_pixel(pixels, off))
    return out
