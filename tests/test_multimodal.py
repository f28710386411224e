"""Real image-header decoder: magic-byte parsing + Arrow plumbing.

The ``impl="real"`` tier of ``operators.multimodal.decode_features`` is a
dependency-free container-header decoder.  Fixtures here are real byte
sequences (a genuine 1×1 PNG, a JFIF JPEG with an APP0 segment and marker
padding before the SOF), not synthetic approximations.
"""

from __future__ import annotations

import base64
import struct

from foresttime_builder_spark.operators.multimodal import (
    decode_features,
    parse_image_header,
    with_payload,
)

# a complete, valid 1x1 transparent PNG (the canonical minimal example)
PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def _jpeg(width: int, height: int) -> bytes:
    """SOI + APP0(JFIF) + fill-byte padding + SOF0 — exercises the segment
    walk, not just a fixed offset."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">H", height)
        + struct.pack(">H", width)
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + b"\xff" + sof0  # stray 0xFF fill before SOF


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<H", width) + struct.pack("<H", height)


def _bmp(width: int, height: int) -> bytes:
    return (
        b"BM" + b"\x00" * 16 + struct.pack("<i", width) + struct.pack("<i", height)
    )


def test_png_real_fixture():
    assert parse_image_header(PNG_1X1) == ("png", 1, 1)


def test_jpeg_segment_walk():
    assert parse_image_header(_jpeg(640, 480)) == ("jpeg", 640, 480)


def test_gif_little_endian():
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200)


def test_bmp_topdown_negative_height():
    assert parse_image_header(_bmp(128, -64)) == ("bmp", 128, 64)


def test_unrecognized_and_truncated_yield_none():
    assert parse_image_header(b"") is None
    assert parse_image_header(b"plain text, not an image") is None
    assert parse_image_header(PNG_1X1[:12]) is None  # truncated before IHDR
    assert parse_image_header(b"\xff\xd8\xff\xc0\x00") is None  # cut SOF


def test_decode_features_real_end_to_end(spark):
    rows = [
        (1, bytearray(PNG_1X1)),
        (2, bytearray(_jpeg(99, 44))),
        (3, bytearray(_gif(7, 9))),
        (4, bytearray(b"not media")),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"], r["byte_len"])
        for r in decode_features(df, impl="real").collect()
    }
    assert got[1] == ("png", 1, 1, len(PNG_1X1))
    assert got[2] == ("jpeg", 99, 44, len(_jpeg(99, 44)))
    assert got[3] == ("gif", 7, 9, 10)
    assert got[4] == (None, None, None, 9)


def test_fake_tier_still_available(spark):
    df = with_payload(
        spark.createDataFrame([(1, "hello")], schema="doc_id long, text string")
    )
    out = decode_features(df, impl="fake").collect()
    assert len(out) == 1 and len(out[0]["features"]) == 8
